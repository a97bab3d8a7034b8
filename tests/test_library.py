"""Library model tests: every canned literature model builds and simulates
(reference models: hilo_mpc/library/models.py)."""
import numpy as np
import pytest

from hilo_mpc_tpu.library import (cstr_schaffner_and_zeitz, cstr_seborg,
                                  ecoli_D1210_conti, ecoli_D1210_fedbatch,
                                  scerevisiae_SEY2102_fedbatch)


class TestCSTRs:
    def test_schaffner_zeitz_structure(self):
        m = cstr_schaffner_and_zeitz()
        assert m.dynamical_states == ["x_1", "x_2"]
        assert m.inputs == ["u"]
        assert set(m.parameters) == {"a_1", "b_1", "a_2", "b_2", "g", "E"}
        assert m.measurements == ["y"]

    def test_seborg_structure_and_sim(self):
        m = cstr_seborg()
        assert m.dynamical_states == ["C_A", "T", "T_c"]
        assert m.inputs == ["T_cr"]
        # R = 8.314 folded in as a constant, not a parameter
        assert "R" not in m.parameters
        assert m._x.units.get("T") == "K"
        # Seborg parameter values (standard example values)
        pmap = {"q_0": 100.0, "V": 100.0, "C_Af": 1.0, "k_0": 7.2e10,
                "E": 72750.0, "T_f": 350.0, "DeltaH_r": -5e4, "rho": 1000.0,
                "C_p": 0.239, "UA": 5e4, "tau": 2.0}
        p = [pmap[n] for n in m.parameters]
        m.setup(dt=0.05, integration_method="collocation", degree=3)
        m.set_initial_conditions([0.5, 350.0, 300.0])
        m.set_initial_parameter_values(p)
        out = m.simulate(u=np.full((20, 1), 300.0), steps=20)
        assert np.all(np.isfinite(out["x"]))
        assert out["x"][-1, 0] > 0  # concentration stays positive


class TestBioreactors:
    def test_ecoli_simple(self):
        m = ecoli_D1210_conti("simple")
        assert m.dynamical_states == ["X", "S", "P", "I"]
        assert m.parameters == ["Sf", "If", "mu", "Rs", "Rfp"]
        m.setup(dt=0.1, integration_method="rk4")
        m.set_initial_conditions([0.1, 40.0, 0.0, 0.0])
        out = m.simulate(u=np.zeros((10, 2)),
                         p=np.array([100.0, 4.0, 0.2, 0.4, 0.05]), steps=10)
        assert np.all(np.isfinite(out["x"]))
        assert out["x"][-1, 0] > 0.1  # biomass grows

    def test_ecoli_complex(self):
        m = ecoli_D1210_conti("complex")
        assert m.n_x == 6
        assert m.measurements == ["mu", "Rs", "Rfp"]
        m.setup(dt=0.05, integration_method="rk4")
        m.set_initial_conditions([0.1, 40.0, 0.0, 1.0, 1.0, 0.0])
        out = m.simulate(u=np.full((10, 2), 0.05),
                         p=np.array([100.0, 4.0]), steps=10)
        assert np.all(np.isfinite(out["x"]))
        assert np.all(np.isfinite(out["y"]))

    def test_ecoli_fedbatch_volume_grows(self):
        m = ecoli_D1210_fedbatch()
        assert m.dynamical_states[-1] == "V"
        m.setup(dt=0.05, integration_method="rk4")
        m.set_initial_conditions([0.1, 40.0, 0.0, 1.0, 1.0, 0.0, 1.0])
        out = m.simulate(u=np.full((10, 2), 0.01), steps=10)
        assert out["x"][-1, -1] > 1.0  # volume increases with feeding

    def test_scerevisiae(self):
        m = scerevisiae_SEY2102_fedbatch()
        assert m.n_x == 5 and m.n_u == 1
        m.setup(dt=0.05, integration_method="rk4")
        m.set_initial_conditions([1.0, 0.5, 0.0, 0.0, 1.0])
        out = m.simulate(u=np.full((10, 1), 0.02), steps=10)
        assert np.all(np.isfinite(out["x"]))
        assert out["x"][-1, 0] > 1.0  # biomass grows on substrate
