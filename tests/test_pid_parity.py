"""PID option/validation parity with the reference's test_PID.py (24 tests:
default tunings, derived k_i/k_d, diagonal-only multi-loop matrices, set-point
dimension checks, not-set-up errors)."""
import numpy as np
import pytest

from hilo_mpc_tpu import PID


class TestDefaults:
    def test_initial_tunings(self):
        # reference: k_p = 1, t_i = inf (=> k_i = 0), t_d = 0 (=> k_d = 0)
        pid = PID()
        np.testing.assert_equal(pid.k_p, np.ones(1))
        np.testing.assert_equal(pid.t_i, np.full(1, np.inf))
        np.testing.assert_equal(pid.k_i, np.zeros(1))
        np.testing.assert_equal(pid.t_d, np.zeros(1))
        np.testing.assert_equal(pid.k_d, np.zeros(1))

    def test_initial_set_point(self):
        np.testing.assert_allclose(PID().set_point, np.zeros(1))

    def test_initial_multi_loop(self):
        pid = PID(n_set_points=3)
        assert pid.n_set_points == 3
        np.testing.assert_equal(pid.k_p, np.ones(3))
        np.testing.assert_allclose(pid.set_point, np.zeros(3))

    def test_is_setup(self):
        pid = PID()
        assert not pid.is_setup()
        pid.setup(dt=0.01)
        assert pid.is_setup()


class TestTuningSetters:
    def test_set_k_p(self):
        pid = PID()
        pid.k_p = 2
        np.testing.assert_equal(pid.k_p, np.array([2.0]))

    def test_set_t_i_derives_k_i(self):
        pid = PID()
        pid.t_i = 0.1
        np.testing.assert_equal(pid.t_i, np.array([0.1]))
        np.testing.assert_allclose(pid.k_i, np.array([10.0]))

    def test_set_t_d_derives_k_d(self):
        pid = PID()
        pid.t_d = 10.0
        np.testing.assert_equal(pid.t_d, np.array([10.0]))
        np.testing.assert_allclose(pid.k_d, np.array([10.0]))

    @pytest.mark.parametrize("attr", ["k_p", "t_i", "t_d"])
    def test_coupled_matrix_rejected(self, attr):
        pid = PID(n_set_points=2)
        with pytest.raises(ValueError, match="diagonal"):
            setattr(pid, attr, np.array([[1.0, 0.5], [0.0, 1.0]]))

    @pytest.mark.parametrize("attr", ["k_p", "t_i", "t_d"])
    def test_diagonal_matrix_accepted(self, attr):
        pid = PID(n_set_points=2)
        setattr(pid, attr, np.diag([2.0, 3.0]))
        np.testing.assert_equal(getattr(pid, attr), np.array([2.0, 3.0]))

    def test_scalar_broadcast_multi_loop(self):
        pid = PID(n_set_points=2)
        pid.k_p = 2.0
        np.testing.assert_equal(pid.k_p, np.array([2.0, 2.0]))

    def test_tunings_tuple(self):
        pid = PID()
        pid.tunings = (2.0, 4.0, 0.5)
        np.testing.assert_allclose(pid.k_i, np.array([0.5]))
        np.testing.assert_allclose(pid.k_d, np.array([1.0]))


class TestSetPoints:
    def test_single(self):
        pid = PID()
        pid.setup(dt=0.01)
        pid.set_point = 1.0
        np.testing.assert_allclose(pid.set_point, np.array([1.0]))

    def test_multi_from_scalar(self):
        pid = PID(n_set_points=3)
        pid.setup(dt=0.01)
        pid.set_point = 1.0
        np.testing.assert_allclose(pid.set_point, np.ones(3))

    def test_multi_from_vector(self):
        pid = PID(n_set_points=2)
        pid.set_point = [1.0, 2.0]
        np.testing.assert_allclose(pid.set_point, np.array([1.0, 2.0]))

    def test_wrong_dimension_raises(self):
        # reference: test_PID.py:211-226
        pid = PID(n_set_points=4)
        pid.setup(dt=0.01)
        with pytest.raises(ValueError, match="3x1.*4x1"):
            pid.set_point = [1.0, 1.0, 1.0]


class TestCall:
    def test_not_set_up_raises(self):
        pid = PID()
        with pytest.raises(RuntimeError, match="setup"):
            pid.call(pv=0.0)

    def test_p_only_first_move(self):
        # first call from zero history: u = k_p * e (velocity form from u=0)
        pid = PID(k_p=2.0)
        pid.setup(dt=0.1)
        pid.set_point = 1.0
        u = pid.call(pv=0.0)
        np.testing.assert_allclose(u, [2.0])

    def test_multi_loop_independent(self):
        pid = PID(n_set_points=2, k_p=[1.0, 10.0])
        pid.setup(dt=0.1)
        pid.set_point = [1.0, 1.0]
        u = pid.call(pv=[0.0, 0.0])
        np.testing.assert_allclose(u, [1.0, 10.0])
