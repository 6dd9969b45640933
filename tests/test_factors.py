import jax
import jax.numpy as jnp
import numpy as np

from aprilsam_tpu.factors import (
    eval_xyt, eval_xytpos, gn_blocks_xyt, graph_chi2,
)
from aprilsam_tpu.geometry import mod2pi, xyt_inv_mul


def _random_problem(seed=0, F=32, N=16):
    rng = np.random.default_rng(seed)
    states = rng.uniform(-5, 5, size=(N, 3))
    a = rng.integers(0, N, size=F)
    b = (a + 1 + rng.integers(0, N - 1, size=F)) % N
    z = rng.uniform(-2, 2, size=(F, 3))
    # symmetric SPD-ish W plus asymmetric upper-only variants
    Wq = rng.uniform(-1, 1, size=(F, 3, 3))
    W = np.einsum("fik,fjk->fij", Wq, Wq) + 3 * np.eye(3)
    return states, a, b, z, W


def test_xyt_residual_matches_definition():
    states, a, b, z, W = _random_problem()
    ev = eval_xyt(jnp.asarray(states), jnp.asarray(a), jnp.asarray(b),
                  jnp.asarray(z), jnp.asarray(W))
    # residual = z - inv(pose_a) . pose_b with wrapped theta
    zhat = np.asarray(xyt_inv_mul(states[a], states[b]))
    r_expect = z - zhat
    r_expect[:, 2] = np.asarray(mod2pi(jnp.asarray(r_expect[:, 2])))
    np.testing.assert_allclose(np.asarray(ev.r), r_expect, atol=1e-12)
    # chi2 = r^T W r with W exactly as stored
    chi2 = np.einsum("fi,fij,fj->f", r_expect, W, r_expect)
    np.testing.assert_allclose(np.asarray(ev.chi2), chi2, atol=1e-9)


def test_xyt_jacobians_match_autodiff():
    """Analytic Jacobians (reference closed forms, april_graph_xyt.c:90-100)
    must equal d zhat / d pose from jax.jacfwd."""
    states, a, b, z, W = _random_problem(seed=3, F=8)

    def zhat_fn(pa, pb):
        ta = pa[2]
        ca, sa = jnp.cos(ta), jnp.sin(ta)
        dx, dy = pb[0] - pa[0], pb[1] - pa[1]
        return jnp.array([ca * dx + sa * dy, -sa * dx + ca * dy, pb[2] - ta])

    ev = eval_xyt(jnp.asarray(states), jnp.asarray(a), jnp.asarray(b),
                  jnp.asarray(z), jnp.asarray(W))
    for f in range(8):
        pa = jnp.asarray(states[a[f]])
        pb = jnp.asarray(states[b[f]])
        Ja = jax.jacfwd(zhat_fn, argnums=0)(pa, pb)
        Jb = jax.jacfwd(zhat_fn, argnums=1)(pa, pb)
        np.testing.assert_allclose(np.asarray(ev.Ja[f]), np.asarray(Ja), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ev.Jb[f]), np.asarray(Jb), atol=1e-9)


def test_gn_blocks():
    states, a, b, z, W = _random_problem(seed=5, F=6)
    ev = eval_xyt(jnp.asarray(states), jnp.asarray(a), jnp.asarray(b),
                  jnp.asarray(z), jnp.asarray(W))
    Haa, Hab, Hba, Hbb, ga, gb = gn_blocks_xyt(ev, jnp.asarray(W))
    Ja, Jb, r = np.asarray(ev.Ja), np.asarray(ev.Jb), np.asarray(ev.r)
    np.testing.assert_allclose(
        np.asarray(Haa), np.einsum("fki,fkl,flj->fij", Ja, W, Ja), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(Hab), np.einsum("fki,fkl,flj->fij", Ja, W, Jb), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ga), np.einsum("fki,fkl,fl->fi", Ja, W, r), atol=1e-9
    )


def test_xytpos_eval():
    rng = np.random.default_rng(7)
    states = rng.uniform(-3, 3, size=(5, 3))
    idx = np.array([0, 2, 4])
    z = rng.uniform(-3, 3, size=(3, 3))
    W = np.tile(np.diag([1e4, 1e4, 1e3]), (3, 1, 1))
    ev = eval_xytpos(jnp.asarray(states), jnp.asarray(idx), jnp.asarray(z),
                     jnp.asarray(W))
    r = z - states[idx]
    r[:, 2] = np.asarray(mod2pi(jnp.asarray(r[:, 2])))
    np.testing.assert_allclose(np.asarray(ev.r), r, atol=1e-12)


def test_graph_chi2_convention(m3500=None):
    """Device chi2 == host chi2 (0.5x xyt / 1.0x xytpos convention)."""
    from aprilsam_tpu.graph import FactorGraph

    rng = np.random.default_rng(11)
    g = FactorGraph()
    for i in range(6):
        g.add_node(rng.uniform(-1, 1, size=3))
    for i in range(5):
        g.add_factor_xyt(i, i + 1, rng.uniform(-1, 1, 3), np.diag([100.0, 100.0, 300.0]))
    g.add_factor_xytpos(0, np.zeros(3), np.diag([1e4, 1e4, 1e3]))

    host = g.chi2()
    st = jnp.asarray(g.states)
    t, nodes, z, W = g.factor_slices()
    from aprilsam_tpu.graph import FACTOR_XYT

    m = t == FACTOR_XYT
    dev = graph_chi2(
        st,
        jnp.asarray(nodes[m, 0]), jnp.asarray(nodes[m, 1]),
        jnp.asarray(z[m]), jnp.asarray(W[m]),
        jnp.asarray(nodes[~m, 0]), jnp.asarray(z[~m]), jnp.asarray(W[~m]),
    )
    np.testing.assert_allclose(float(dev), host, rtol=1e-12)
