"""Regression tests for the round-2 self-review findings.

Each test pins one fixed defect: C integer division in the embedded
transpiler, PF sample_size vs the jitted step's baked particle count,
PEP 563 string annotations in the PF pdf setter, per-GP fixed values /
bounds in GPArray.fit_model_batched, and plot_prediction extras_names
under-length.
"""
import numpy as np
import pytest

from hilo_mpc_tpu import GP, GPArray, NMPC, PF, Model
from hilo_mpc_tpu.embedded.nmpc_codegen import _CExpr, _c_float
from hilo_mpc_tpu.library import cstr_schaffner_and_zeitz


# -- C transpiler: no integer division ------------------------------------------
def test_c_float_always_double_literal():
    assert _c_float(2.0) == "2.0"
    assert _c_float(-3) == "-3.0"
    assert "." in _c_float(1e0) or "e" in _c_float(1e0)
    assert _c_float(0.5) == "0.5"


def test_integer_ratio_is_not_c_integer_division():
    c = _CExpr({"x": "x[0]"}).emit("3/2 * x")
    # both literals must be doubles: (3.0 / 2.0), never (3 / 2) == 1 in C
    assert "3.0" in c and "2.0" in c


def test_int_ratio_model_compiles_and_matches(tmp_path):
    import ctypes
    import os

    from hilo_mpc_tpu.embedded.codegen import compile_shared
    from hilo_mpc_tpu.embedded.nmpc_codegen import generate_model_rhs_c

    m = Model()
    m.set_inputs("u")
    m.set_equations("dx/dt = -1/2*x + 3/4*u")
    body = generate_model_rhs_c(m)
    src = tmp_path / "rhs.c"
    src.write_text("static const double P_VALS[1] = {0};\n"
                   "void rhs(const double *x, const double *u, double t, "
                   "double *dx) {\n" + body + "\n}\n")
    lib = ctypes.CDLL(compile_shared(str(src)))
    x = (ctypes.c_double * 1)(2.0)
    u = (ctypes.c_double * 1)(4.0)
    dx = (ctypes.c_double * 1)()
    lib.rhs(x, u, ctypes.c_double(0.0), dx)
    np.testing.assert_allclose(dx[0], -0.5 * 2.0 + 0.75 * 4.0)  # == 2.0


# -- PF: sample_size rebuilds the jitted step --------------------------------------
def _pf_model():
    m = Model(name="pend")
    m.set_inputs("tau")
    m.set_equations("""
    dth/dt = om(t)
    dom/dt = -9.81*sin(th(t)) - 0.3*om(t) + tau(k)
    y(k) = th(t)
    """)
    return m


def test_sample_size_change_after_setup_estimates():
    pf = PF(_pf_model(), n_particles=30, seed=0)
    pf.setup(dt=0.05)
    pf.Q, pf.R = [1e-4, 1e-4], [1e-3]
    pf.set_initial_guess([0.3, 0.0], P0=np.eye(2) * 0.01)
    pf.sample_size = 50   # used to leave the jitted step at 30 particles
    x_hat = pf.estimate(np.array([[0.29], [0.28]]), u=np.zeros((2, 1)))
    assert pf.particles.shape == (50, 2)
    assert np.all(np.isfinite(x_hat))


def test_pep563_string_annotations_accepted():
    pf = PF(_pf_model(), n_particles=10)
    pf.setup(dt=0.05)
    ns = {}
    exec("from __future__ import annotations\n"
         "import numpy as np\n"
         "def pdf(mu: np.ndarray, sigma: np.ndarray, n: int) -> np.ndarray:\n"
         "    return np.tile(np.asarray(mu), (n, 1))\n", ns)
    pf.probability_density_function = ns["pdf"]  # used to raise TypeError
    assert pf.probability_density_function is ns["pdf"]


# -- GPArray.fit_model_batched: per-GP fixed values and bounds ----------------------
def _gp_pair(noise_fixed=(0.05, 0.2)):
    rng = np.random.default_rng(0)
    X = np.linspace(0, 3, 15)[:, None]
    gps = []
    for i, nv in enumerate(noise_fixed):
        g = GP("x", f"y{i}", noise_variance=nv)
        g.noise_variance.fixed = True
        g.set_training_data(X, np.sin(X[:, 0]) + 0.02 * rng.standard_normal(15))
        gps.append(g)
    return gps, X


def test_batched_fit_uses_each_gps_own_fixed_values():
    gps, X = _gp_pair()
    arr = GPArray(2)
    arr[0], arr[1] = gps
    arr.fit_model_batched(max_iter=40)
    # fixed values untouched AND distinct per GP
    np.testing.assert_allclose(arr[0].noise_variance.value, [0.05])
    np.testing.assert_allclose(arr[1].noise_variance.value, [0.2])
    # the larger fixed noise must show up in ITS OWN posterior variance
    _, v0 = arr[0].predict(X[:3], include_noise=True)
    _, v1 = arr[1].predict(X[:3], include_noise=True)
    assert float(v1.mean()) > float(v0.mean())


def test_batched_fit_heterogeneous_fixed_structure_rejected():
    gps, _ = _gp_pair()
    gps[1].noise_variance.fixed = False   # different FIXED structure
    arr = GPArray(2)
    arr[0], arr[1] = gps
    # rejected either by the trainable-signature check (noise becomes
    # trainable on one GP) or by the fixed-structure check
    with pytest.raises(ValueError, match="structure"):
        arr.fit_model_batched(max_iter=5)


def test_batched_fit_heterogeneous_priors_rejected():
    from hilo_mpc_tpu.ml.priors import GaussianPrior

    rng = np.random.default_rng(0)
    X = np.linspace(0, 3, 12)[:, None]
    g0, g1 = GP("x", "a"), GP("x", "b")
    for g in (g0, g1):
        g.set_training_data(X, np.sin(X[:, 0]) + 0.02 * rng.standard_normal(12))
    g1.noise_variance.prior = GaussianPrior(0.1, 0.01)
    arr = GPArray(2)
    arr[0], arr[1] = g0, g1
    with pytest.raises(ValueError, match="prior"):
        arr.fit_model_batched(max_iter=5)


def test_batched_fit_respects_bounds():
    rng = np.random.default_rng(1)
    X = np.linspace(0, 3, 15)[:, None]
    arr = GPArray(2)
    for i in range(2):
        g = GP("x", f"y{i}", noise_variance=0.5)
        g.noise_variance.bounds = (0.3, 1.0)   # keep noise large on purpose
        g.set_training_data(X, np.sin(X[:, 0]) + 0.01 * rng.standard_normal(15))
        arr[i] = g
    arr.fit_model_batched(max_iter=60)
    for g in arr:
        nv = float(np.squeeze(g.noise_variance.value))
        assert 0.3 - 1e-9 <= nv <= 1.0 + 1e-9  # used to be driven to ~0


# -- plot_prediction: short extras_names ---------------------------------------------
def test_plot_prediction_short_extras_names(tmp_path):
    nmpc = NMPC(cstr_schaffner_and_zeitz())
    nmpc.horizon = 5
    nmpc.quad_stage_cost.add_states(weights=[10.0, 10.0], ref=[0.3, 0.18055])
    nmpc.quad_stage_cost.add_inputs(weights=0.1)
    nmpc.set_box_constraints(u_lb=[-5.0], u_ub=[5.0])
    nmpc.set_parameters([1.0] * 6)
    nmpc.setup(options={"dt": 0.1})
    nmpc.optimize([0.2, 0.1])
    extras = {"x_1": np.full(5, 0.25), "x_2": np.full(5, 0.15)}
    # one name for two extras: second falls back to its key instead of crashing
    nmpc.plot_prediction(extras=extras, extras_names=["measured"],
                         save_plot=True, plot_dir=str(tmp_path),
                         name_file="pred.png", show_plot=False)
    import os

    assert os.path.getsize(tmp_path / "pred.png") > 0
