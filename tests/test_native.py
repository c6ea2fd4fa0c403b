"""Native C++ core: build, parity with numpy fallbacks, integration."""

import numpy as np
import pytest

from etpnav_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_apsp_matches_numpy(lib, rng):
    from etpnav_tpu.graph.topo_map import TopoMap

    def build(use_native):
        m = TopoMap()
        if not use_native:
            # force numpy path by emptying the lib temporarily
            pass
        return m

    edges = []
    n = 15
    for i in range(n):
        for j in rng.choice(max(i, 1), size=min(i, 3), replace=False):
            edges.append((i, int(j), float(rng.random() * 4 + 0.2)))

    m_native = TopoMap()
    for i in range(n):
        m_native.node_pos.append(np.zeros(3))
        m_native._add_node_to_apsp()
    saved = native._lib
    try:
        for u, v, w in edges:
            m_native.add_edge(u, v, w)
        # numpy reference
        native._lib = None
        native._tried = True
        m_np = TopoMap()
        for i in range(n):
            m_np.node_pos.append(np.zeros(3))
            m_np._add_node_to_apsp()
        for u, v, w in edges:
            m_np.add_edge(u, v, w)
    finally:
        native._lib = saved
    np.testing.assert_allclose(m_native._dist, m_np._dist, atol=1e-9)
    np.testing.assert_array_equal(m_native._hops, m_np._hops)
    # next-hop matrices may differ on ties; check path weights agree
    for u in range(0, n, 3):
        for v in range(0, n, 4):
            if m_native.distance(u, v) < 1e8:
                p = m_native.path(u, v)
                assert p[0] == u and p[-1] == v


def test_native_pairwise(lib, rng):
    n, m = 8, 5
    D = np.abs(rng.standard_normal((n, n))) + 0.1
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0.0)
    anchors = rng.integers(0, n, m)
    offsets = np.abs(rng.standard_normal(m))
    out = native.pairwise_assemble(D, anchors, offsets, 30.0)
    ref = (offsets[:, None] + offsets[None, :]
           + D[np.ix_(anchors, anchors)])
    np.fill_diagonal(ref, 0.0)
    np.testing.assert_allclose(out, ref / 30.0, atol=1e-12)


def test_native_dtw_matches_python(lib, rng):
    a = rng.standard_normal((40, 3))
    b = rng.standard_normal((55, 3))
    res = native.dtw(a, b)
    # python DP reference
    import etpnav_tpu.metrics as metrics
    saved = native._lib
    try:
        native._lib = None
        native._tried = True
        ref = metrics.dtw(a, b)
    finally:
        native._lib = saved
    assert res == pytest.approx(ref, abs=1e-9)
