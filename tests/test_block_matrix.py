"""General BlockMatrix toolkit vs reference CUberBlockMatrix API
(include/slam/BlockMatrix.h): heterogeneous blocks, slice/permute, LU,
MatrixMarket round trip, VBR export, rasterize-diff."""
import numpy as np
import pytest

from slam_plus_plus_tpu.linalg.block_matrix import BlockMatrix, from_partitioned


def _random_bm(rng, row_sizes, col_sizes, density=0.6):
    m = BlockMatrix(row_sizes, col_sizes)
    for i in range(len(row_sizes)):
        for j in range(len(col_sizes)):
            if rng.random() < density:
                m.set_block(i, j, rng.standard_normal(
                    (row_sizes[i], col_sizes[j])))
    return m


def test_dense_round_trip_heterogeneous():
    rng = np.random.default_rng(0)
    m = _random_bm(rng, [3, 2, 4], [2, 3], density=1.0)
    d = m.to_dense()
    assert d.shape == (9, 5)
    m2 = BlockMatrix.from_dense(d, [3, 2, 4], [2, 3])
    assert np.allclose(m2.to_dense(), d)
    assert np.allclose(m.to_csr().toarray(), d)


def test_transpose_slice_permute():
    rng = np.random.default_rng(1)
    m = _random_bm(rng, [2, 3, 2], [2, 3, 2])
    d = m.to_dense()
    assert np.allclose(m.transpose().to_dense(), d.T)
    s = m.slice((1, 3), (0, 2))
    assert np.allclose(s.to_dense(), d[2:7, 0:5])
    p = m.permute([2, 0, 1], [2, 0, 1])
    off = np.concatenate([[0], np.cumsum([2, 3, 2])])
    idx = np.concatenate([np.arange(off[i], off[i + 1]) for i in (2, 0, 1)])
    assert np.allclose(p.to_dense(), d[np.ix_(idx, idx)])


def test_matmul_add():
    rng = np.random.default_rng(2)
    a = _random_bm(rng, [2, 3], [3, 2])
    b = _random_bm(rng, [3, 2], [2, 2])
    assert np.allclose(a.matmul(b).to_dense(), a.to_dense() @ b.to_dense())
    c = _random_bm(rng, [2, 3], [3, 2])
    assert np.allclose(a.add(c).to_dense(), a.to_dense() + c.to_dense())


def test_block_lu():
    rng = np.random.default_rng(3)
    sizes = [2, 3, 2]
    m = _random_bm(rng, sizes, sizes, density=0.8)
    for i in range(3):
        m.add_to_block(i, i, 3.0 * np.eye(sizes[i]))   # make diagonal viable
    perm, L, U = m.lu()
    d = m.to_dense()
    off = np.concatenate([[0], np.cumsum(sizes)])
    idx = np.concatenate([np.arange(off[i], off[i + 1]) for i in perm])
    assert np.allclose(L.to_dense() @ U.to_dense(), d[idx, :], atol=1e-10)
    # L unit-lower / U upper at the block level
    assert np.allclose(np.triu(L.to_dense(), 1)[np.ix_(range(2), range(2, 7))],
                       0)


def test_matrix_market_round_trip(tmp_path):
    rng = np.random.default_rng(4)
    m = _random_bm(rng, [2, 3], [2, 3], density=0.7)
    p = str(tmp_path / "m.mtx")
    m.save_matrix_market(p)
    m2 = BlockMatrix.load_matrix_market(p)
    assert m2.row_sizes == [2, 3] and m2.col_sizes == [2, 3]
    assert np.allclose(m2.to_dense(), m.to_dense())


def test_vbr_export():
    rng = np.random.default_rng(5)
    m = _random_bm(rng, [2, 3], [3, 2], density=1.0)
    rpntr, cpntr, bpntrb, bpntre, indx, bindx, val = m.to_vbr()
    # reconstruct and compare
    d = np.zeros(m.shape)
    for bi in range(len(m.row_sizes)):
        for k in range(bpntrb[bi], bpntre[bi]):
            bj = bindx[k]
            h = rpntr[bi + 1] - rpntr[bi]
            w = cpntr[bj + 1] - cpntr[bj]
            blk = val[indx[k]:indx[k + 1]].reshape(h, w, order="F")
            d[rpntr[bi]:rpntr[bi + 1], cpntr[bj]:cpntr[bj + 1]] = blk
    assert np.allclose(d, m.to_dense())


def test_rasterize_diff():
    rng = np.random.default_rng(6)
    a = _random_bm(rng, [2, 2], [2, 2], density=1.0)
    b = BlockMatrix([2, 2], [2, 2])
    b.set_block(0, 0, a.blocks[(0, 0)])              # unchanged
    b.set_block(0, 1, a.blocks[(0, 1)] + 1.0)        # changed
    b.set_block(1, 0, np.ones((2, 2)))               # (overwrites) changed
    img = b.rasterize_diff(a)
    assert img[0, 0] == 1 and img[0, 1] == 2
    assert img[1, 1] == 4                            # removed vs a


def test_from_partitioned_matches_scipy(tmp_path):
    import slam_plus_plus_tpu.models  # noqa: F401
    from slam_plus_plus_tpu.assembly.assembler import Assembler
    from slam_plus_plus_tpu.io import datasets as D
    from slam_plus_plus_tpu.io.parser import parse_g2o
    from slam_plus_plus_tpu.linalg.bsr import partitioned_to_scipy

    cams, pts, obs = D.make_ba_scene(n_cams=4, n_points=30, seed=3)
    p = str(tmp_path / "f.txt")
    D.write_g2o_ba(p, cams, pts, obs)
    s = parse_g2o(p)
    asm = Assembler(s)
    bs = asm.assemble(asm.snapshot_states(s))
    bm = from_partitioned(asm, bs)
    ref = partitioned_to_scipy(
        asm.pp_rows, asm.pp_cols, np.asarray(bs.pp_blocks), asm.Np, asm.Bp,
        asm.pl_rows, asm.pl_cols, np.asarray(bs.pl_blocks),
        np.asarray(bs.ll_blocks), asm.Nl, asm.Bl)
    assert np.allclose(bm.to_csr().toarray(), ref.toarray(), atol=1e-9)
