"""Native mesh-kit (C++/ctypes) vs the numpy reference implementations."""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu import native
from small_fem_solver_tpu.ops.assembly import build_bcsr_pattern


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native mesh_kit not built (no compiler?)")
    return True


def test_bcsr_pattern_matches_numpy(have_native):
    model = sf.refine_model(sf.default_3leg_jacket(), 4)
    conn = np.asarray(model.conn)
    ref = build_bcsr_pattern(conn, model.n_nodes)
    out = native.bcsr_pattern_native(conn, model.n_nodes)
    block_rows, block_cols, row_ptr, elem_slot = out
    np.testing.assert_array_equal(block_rows, np.asarray(ref.block_rows))
    np.testing.assert_array_equal(block_cols, np.asarray(ref.block_cols))
    np.testing.assert_array_equal(row_ptr, np.asarray(ref.row_ptr))
    np.testing.assert_array_equal(elem_slot, np.asarray(ref.elem_slot))


def test_rcm_is_valid_permutation_and_reduces_bandwidth(have_native):
    model = sf.refine_model(sf.default_3leg_jacket(), 8)
    conn = np.asarray(model.conn)
    n = model.n_nodes
    perm = native.rcm_ordering(conn, n)
    assert sorted(perm.tolist()) == list(range(n))

    def bandwidth(order):
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        return int(np.abs(inv[conn[:, 0]] - inv[conn[:, 1]]).max())

    bw_natural = bandwidth(np.arange(n))
    bw_rcm = bandwidth(perm)
    assert bw_rcm < bw_natural


def test_refine_members_matches_python(have_native):
    model = sf.default_3leg_jacket()
    coords = np.asarray(model.coords)
    conn = np.asarray(model.conn)
    sect = np.asarray(model.sect_id)
    out = native.refine_members_native(coords, conn, sect, 4)
    new_coords, new_conn, new_sect = out
    ref = sf.refine_model(model, 4)
    np.testing.assert_allclose(new_coords, np.asarray(ref.coords), rtol=1e-15)
    np.testing.assert_array_equal(new_conn, np.asarray(ref.conn))
    np.testing.assert_array_equal(new_sect, np.asarray(ref.sect_id))


def test_python_rcm_fallback_matches_native(have_native):
    """The pure-Python fallback implements the same algorithm."""
    model = sf.default_3leg_jacket()
    conn = np.asarray(model.conn)
    n = model.n_nodes
    native_perm = native.rcm_ordering(conn, n)
    # force the fallback path
    lib, native._lib = native._lib, None
    tried, native._tried = native._tried, True
    try:
        py_perm = native.rcm_ordering(conn, n)
    finally:
        native._lib, native._tried = lib, tried
    np.testing.assert_array_equal(native_perm, py_perm)


def test_native_aggregation_matches_python():
    """The C++ BFS aggregation is bit-identical to the Python reference
    (same half-edge neighbor order, same frontier order, same stop rule)."""
    import numpy as np

    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu import native
    from small_fem_solver_tpu.api import _cached_bcsr_pattern
    from small_fem_solver_tpu.ops import coarse as coarse_mod

    if not native.available() or not hasattr(native._load(),
                                             "aggregate_nodes"):
        import pytest
        pytest.skip("native library not built")

    for n_seg, tsz in ((4, 7), (16, 32), (32, 33)):
        model = sf.refine_model(sf.default_3leg_jacket(), n_seg)
        pattern = _cached_bcsr_pattern(model.conn, model.n_nodes)
        br = np.asarray(pattern.block_rows)
        bc = np.asarray(pattern.block_cols)
        off = br != bc
        edges = np.stack([br[off], bc[off]], axis=1)
        got = native.aggregate_nodes_native(edges, model.n_nodes, tsz)
        # force the pure-Python path for the reference answer
        orig = native.aggregate_nodes_native
        try:
            native.aggregate_nodes_native = lambda *a, **k: None
            want = coarse_mod.aggregate_nodes(edges, model.n_nodes, tsz)
        finally:
            native.aggregate_nodes_native = orig
        np.testing.assert_array_equal(got, want)


def test_rainflow_native_matches_python():
    """The C++ batched rainflow reproduces the Python ASTM stack exactly
    (same turning-point reduction, same half/full weights), and is fast."""
    import time

    from small_fem_solver_tpu.native import rainflow_damage_sums_native
    from small_fem_solver_tpu.ops.spectrum import _rainflow_ranges

    rng = np.random.default_rng(5)
    S, M = 1500, 40
    # broadband + narrowband + constant + monotone columns
    y = rng.standard_normal((S, M)).cumsum(axis=0)
    y[:, 0] = 3.0                      # constant: zero damage
    y[:, 1] = np.arange(S)             # monotone: one half cycle
    y[:, 2] = 5 * np.sin(np.arange(S) * 0.3)
    m_slope = 3.0
    out = rainflow_damage_sums_native(y, m_slope)
    if out is None:
        pytest.skip("native library unavailable")
    sums, counts = out
    for j in range(M):
        r, w = _rainflow_ranges(y[:, j])
        ref = float(np.sum(w * r**m_slope)) if r.size else 0.0
        np.testing.assert_allclose(sums[j], ref, rtol=1e-12, atol=1e-9)
        np.testing.assert_allclose(counts[j], float(w.sum()) if r.size
                                   else 0.0, rtol=1e-12, atol=1e-12)
    assert sums[0] == 0.0
    # speedup sanity (not asserted hard: environment-dependent)
    t0 = time.perf_counter()
    rainflow_damage_sums_native(y, m_slope)
    t_native = time.perf_counter() - t0
    assert t_native < 1.0
