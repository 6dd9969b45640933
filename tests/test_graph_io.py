import numpy as np
import pytest

from aprilsam_tpu.graph import FactorGraph, FACTOR_XYT, FACTOR_XYTPOS
from aprilsam_tpu.io import load_g2o_text, load_graph_file, save_graph_file
from aprilsam_tpu.io.stype import load_graph_bytes, save_graph_bytes

from conftest import M3500_GRAPH, M3500_TXT


def test_m3500_text_load(m3500):
    g = m3500
    assert g.nnodes == 3500
    assert g.nfactors == 5453
    # first edge: EDGE2 0 1 1.030390 0.011350 -0.012958 44.72136 ...
    assert g.ftype[0] == FACTOR_XYT
    np.testing.assert_allclose(g.fz[0], [1.030390, 0.011350, -0.012958])
    np.testing.assert_allclose(g.fW[0][0, 0], 44.721360)
    # loader fills W upper-triangular only (aprilsam_demo.c:73-75)
    assert g.fW[0][1, 0] == 0.0 and g.fW[0][2, 0] == 0.0
    # odom/scan tagging
    assert g.factor_attrs[0].get("type") == "odom"


def test_m3500_binary_matches_text(m3500):
    gb = load_graph_file(M3500_GRAPH)
    gt = m3500
    assert gb.nnodes == gt.nnodes
    assert gb.nfactors == gt.nfactors
    np.testing.assert_allclose(gb.states, gt.states, atol=1e-12)
    np.testing.assert_allclose(
        gb.fz[: gb.nfactors], gt.fz[: gt.nfactors], atol=1e-12
    )
    np.testing.assert_allclose(
        gb.fW[: gb.nfactors], gt.fW[: gt.nfactors], atol=1e-12
    )
    np.testing.assert_array_equal(gb.fnodes[: gb.nfactors], gt.fnodes[: gt.nfactors])
    # attrs survive the reference writer: factor 0 tagged odom
    assert gb.factor_attrs[0].get("type") == "odom"
    # chi2 of the raw loaded state agrees between the two loads
    assert abs(gb.chi2() - gt.chi2()) < 1e-6


def test_roundtrip():
    g = FactorGraph()
    g.add_node([0.1, 0.2, 0.3], init=[0.1, 0.2, 0.3], truth=[0, 0, 0])
    g.add_node([1.0, 2.0, -3.0])
    g.add_factor_xyt(0, 1, [1, 2, 3], np.arange(9).reshape(3, 3) + 1.0,
                     ztruth=[1.1, 2.2, 3.3])
    g.add_factor_xytpos(0, [0, 0, 0], np.diag([1e4, 1e4, 1e3]))
    g.attr.put("string", "name", "unit-test")
    g.attr.put("uint64", "count", 42)
    from aprilsam_tpu.graph import Attributes

    fa = Attributes()
    fa.put("string", "type", "odom")
    g.factor_attrs[0] = fa

    data = save_graph_bytes(g)
    g2 = load_graph_bytes(data)
    assert g2.nnodes == 2 and g2.nfactors == 2
    np.testing.assert_allclose(g2.states, g.states, atol=0)
    np.testing.assert_allclose(g2.fW[0], g.fW[0], atol=0)
    np.testing.assert_allclose(g2.fztruth[0], [1.1, 2.2, 3.3], atol=0)
    assert not g2.has_init[1] and not g2.has_truth[1]
    assert g2.attr.get("name") == "unit-test"
    assert g2.attr.get("count") == 42
    assert g2.factor_attrs[0].get("type") == "odom"
    assert g2.ftype[1] == FACTOR_XYTPOS
    # re-serialize identical structure
    data2 = save_graph_bytes(g2)
    g3 = load_graph_bytes(data2)
    np.testing.assert_allclose(g3.states, g.states, atol=0)


def test_reference_written_graph_roundtrip(tmp_path):
    """Read a reference-written .graph, write it back, read again."""
    g = load_graph_file(M3500_GRAPH)
    p = tmp_path / "rt.graph"
    save_graph_file(g, str(p))
    g2 = load_graph_file(str(p))
    assert g2.nnodes == g.nnodes and g2.nfactors == g.nfactors
    np.testing.assert_allclose(g2.states, g.states, atol=0)
    np.testing.assert_allclose(g2.fW[: g.nfactors], g.fW[: g.nfactors], atol=0)


@pytest.fixture(scope="session")
def reference_demo():
    """Build the C reference demo into /tmp/refbuild (copy-then-make: the
    reference tree is read-only).  Bidirectional byte-compat is a headline
    parity claim, so a broken build FAILS the suite rather than skipping;
    only a missing toolchain skips."""
    import os
    import shutil
    import subprocess

    demo = "/tmp/refbuild/examples/aprilsam_demo"
    if not os.path.exists(demo):
        if shutil.which("gcc") is None and shutil.which("cc") is None:
            pytest.skip("no C toolchain available")
        shutil.rmtree("/tmp/refbuild", ignore_errors=True)
        shutil.copytree("/root/reference", "/tmp/refbuild")
        r = subprocess.run(["make", "-j4"], cwd="/tmp/refbuild",
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0 and os.path.exists(demo), (
            f"reference build failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return demo


def test_c_reference_reads_our_graph(reference_demo):
    """Byte-level interop: a .graph written by our serializer replays in the
    C reference demo (built on demand by the reference_demo fixture)."""
    import subprocess

    demo = reference_demo
    g = load_graph_file(M3500_GRAPH)
    save_graph_file(g, "/tmp/interop_test.graph")
    p = subprocess.Popen(
        [demo, "--graphpath", "/tmp/interop_test.graph"],
        stdout=subprocess.PIPE, text=True, cwd="/tmp/refbuild/examples",
    )
    lines = []
    try:
        for _ in range(40):
            lines.append(p.stdout.readline())
    finally:
        p.kill()
    assert any("Chi squared error" in ln for ln in lines)
