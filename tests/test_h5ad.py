"""h5ad reader/writer: round trip, sparse X, categorical + NaN obs columns."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
import pandas as pd
from scipy import sparse

from alpine_tpu.io.h5ad import read_h5ad, write_h5ad
from alpine_tpu.utils.adata import AnnData


def _sample_adata():
    r = np.random.default_rng(0)
    X = r.random((12, 5)).astype(np.float32)
    obs = pd.DataFrame(
        {
            "batch": pd.Categorical(["a", "b"] * 6),
            "score": np.arange(12, dtype=np.float64),
        },
        index=[f"cell{i}" for i in range(12)],
    )
    var = pd.DataFrame(index=[f"g{i}" for i in range(5)])
    ad = AnnData(X, obs=obs, var=var)
    ad.obsm["emb"] = r.random((12, 3))
    ad.varm["w"] = r.random((5, 3))
    ad.layers["norm"] = X * 2
    return ad


def test_round_trip(tmp_path):
    ad = _sample_adata()
    p = str(tmp_path / "t.h5ad")
    write_h5ad(ad, p)
    back = read_h5ad(p)
    np.testing.assert_allclose(back.X, ad.X)
    assert list(back.obs.index) == list(ad.obs.index)
    assert list(back.obs["batch"]) == list(ad.obs["batch"])
    np.testing.assert_allclose(back.obs["score"], ad.obs["score"])
    np.testing.assert_allclose(back.obsm["emb"], ad.obsm["emb"])
    np.testing.assert_allclose(back.varm["w"], ad.varm["w"])
    np.testing.assert_allclose(back.layers["norm"], ad.layers["norm"])


def test_read_sparse_csr_x(tmp_path):
    """anndata commonly stores X as CSR; reader must densify."""
    r = np.random.default_rng(1)
    dense = (r.random((8, 6)) * (r.random((8, 6)) > 0.5)).astype(np.float32)
    mat = sparse.csr_matrix(dense)
    p = str(tmp_path / "sparse.h5ad")
    with h5py.File(p, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csr_matrix"
        g.attrs["shape"] = mat.shape
        g.create_dataset("data", data=mat.data)
        g.create_dataset("indices", data=mat.indices)
        g.create_dataset("indptr", data=mat.indptr)
        obs = f.create_group("obs")
        obs.attrs["_index"] = "_index"
        obs.create_dataset("_index", data=np.asarray([f"c{i}" for i in range(8)],
                                                     dtype="S"))
        var = f.create_group("var")
        var.attrs["_index"] = "_index"
        var.create_dataset("_index", data=np.asarray([f"g{i}" for i in range(6)],
                                                     dtype="S"))
    back = read_h5ad(p)
    np.testing.assert_allclose(back.X, dense)


def test_nan_categorical_codes(tmp_path):
    """Category code -1 (pandas NaN) must decode to None — it drives the
    semi-supervised zero-row one-hot path."""
    p = str(tmp_path / "nan.h5ad")
    with h5py.File(p, "w") as f:
        f.create_dataset("X", data=np.ones((4, 2), np.float32))
        obs = f.create_group("obs")
        obs.attrs["_index"] = "_index"
        obs.create_dataset("_index", data=np.asarray(list("abcd"), dtype="S"))
        obs.attrs["column-order"] = np.asarray(["lab"], dtype="S")
        cg = obs.create_group("lab")
        cg.attrs["encoding-type"] = "categorical"
        cg.create_dataset("categories", data=np.asarray(["x", "y"], dtype="S"))
        cg.create_dataset("codes", data=np.asarray([0, -1, 1, 0], dtype=np.int8))
        var = f.create_group("var")
        var.attrs["_index"] = "_index"
        var.create_dataset("_index", data=np.asarray(["g0", "g1"], dtype="S"))
    back = read_h5ad(p)
    vals = back.obs["lab"]
    assert list(vals[~vals.isna()]) == ["x", "y", "x"]
    assert vals.isna().sum() == 1 and bool(vals.isna().iloc[1])


def test_fit_from_h5ad(tmp_path):
    """End-to-end: write, read, fit."""
    from alpine_tpu import ALPINE

    ad = _sample_adata()
    p = str(tmp_path / "fit.h5ad")
    write_h5ad(ad, p)
    loaded = read_h5ad(p)
    loaded.obs["batch"] = loaded.obs["batch"].astype(object)
    m = ALPINE(n_components=3, n_covariate_components=[2], lam=[1.0],
               device="cpu", random_state=0)
    m.fit(loaded, ["batch"], max_iter=4)
    assert loaded.obsm["ALPINE_embedding"].shape == (12, 3)


def test_non_ascii_strings_round_trip(tmp_path):
    """Real datasets have UTF-8 labels/barcodes; 'S' dtype would crash."""
    X = np.ones((3, 2), np.float32)
    obs = pd.DataFrame({"célл": pd.Categorical(["naïve", "naïve", "Tγδ"])},
                       index=["バー1", "バー2", "バー3"])
    ad = AnnData(X, obs=obs)
    p = str(tmp_path / "utf8.h5ad")
    write_h5ad(ad, p)
    back = read_h5ad(p)
    assert list(back.obs.index) == ["バー1", "バー2", "バー3"]
    assert list(back.obs["célл"]) == ["naïve", "naïve", "Tγδ"]


def test_written_files_carry_anndata_encoding_metadata(tmp_path):
    """anndata's IO registry dispatches readers on the
    (encoding-type, encoding-version) attribute pair; files without it fail
    or legacy-misparse in real scanpy sessions."""
    import h5py

    ad = _sample_adata()
    p = str(tmp_path / "enc.h5ad")
    write_h5ad(ad, p)
    with h5py.File(p, "r") as f:
        assert f.attrs["encoding-type"] == "anndata"
        assert f["X"].attrs["encoding-type"] == "array"
        assert f["X"].attrs["encoding-version"] == "0.2.0"
        for name in ("obs", "var"):
            g = f[name]
            assert g.attrs["encoding-type"] == "dataframe"
            assert g.attrs["encoding-version"] == "0.2.0"
            assert g["_index"].attrs["encoding-type"] == "string-array"
        cat = f["obs"]["batch"]
        assert cat.attrs["encoding-type"] == "categorical"
        assert cat.attrs["encoding-version"] == "0.2.0"
        assert cat.attrs["ordered"] == False  # noqa: E712
        assert cat["categories"].attrs["encoding-type"] == "string-array"
        assert cat["codes"].attrs["encoding-type"] == "array"
        assert f["obsm"].attrs["encoding-type"] == "dict"
        assert f["obsm"]["emb"].attrs["encoding-type"] == "array"


def test_read_csc_with_bytes_encoding_attr(tmp_path):
    """encoding-type attrs written as fixed-length/bytes (older h5py,
    non-Python writers) must still dispatch the right sparse format; a CSC
    misread as CSR corrupts or crashes."""
    import h5py
    from scipy import sparse

    r = np.random.default_rng(0)
    X = (r.random((6, 4)) < 0.5) * r.random((6, 4)).astype(np.float32)
    csc = sparse.csc_matrix(X)
    p = str(tmp_path / "csc_bytes.h5ad")
    with h5py.File(p, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = np.bytes_("csc_matrix")
        g.attrs["shape"] = X.shape
        g.create_dataset("data", data=csc.data)
        g.create_dataset("indices", data=csc.indices)
        g.create_dataset("indptr", data=csc.indptr)
    back = read_h5ad(p)
    np.testing.assert_allclose(np.asarray(back.X), X, rtol=1e-6)


def test_read_legacy_sparse_without_encoding(tmp_path):
    """Legacy files carry data/indices/indptr with no encoding-type at all;
    the indptr length identifies the compressed axis."""
    import h5py
    from scipy import sparse

    r = np.random.default_rng(1)
    X = (r.random((3, 7)) < 0.5) * r.random((3, 7)).astype(np.float32)
    for fmt, mat in (("csr", sparse.csr_matrix(X)), ("csc", sparse.csc_matrix(X))):
        p = str(tmp_path / f"legacy_{fmt}.h5ad")
        with h5py.File(p, "w") as f:
            g = f.create_group("X")
            g.attrs["shape"] = X.shape
            g.create_dataset("data", data=mat.data)
            g.create_dataset("indices", data=mat.indices)
            g.create_dataset("indptr", data=mat.indptr)
        back = read_h5ad(p)
        np.testing.assert_allclose(np.asarray(back.X), X, rtol=1e-6)


def test_read_nullable_integer_column(tmp_path):
    """anndata >= 0.8 stores pandas Int64/boolean obs columns as
    nullable-integer groups (values + mask); masked entries become None —
    the semi-supervised NA convention."""
    import h5py

    p = str(tmp_path / "nullable.h5ad")
    with h5py.File(p, "w") as f:
        f.create_dataset("X", data=np.ones((3, 2), np.float32))
        obs = f.create_group("obs")
        obs.attrs["_index"] = "_index"
        obs.attrs["column-order"] = np.array(["count"], dtype=object)
        obs.create_dataset("_index", data=np.array(["a", "b", "c"], dtype=object))
        col = obs.create_group("count")
        col.attrs["encoding-type"] = "nullable-integer"
        col.create_dataset("values", data=np.array([1, 2, 3]))
        col.create_dataset("mask", data=np.array([False, True, False]))
    back = read_h5ad(p)
    assert list(back.obs["count"]) == [1, None, 3]


# --- row-range (out-of-core) reads: the multi-process ingestion path -----


def _write_rich(tmp_path, x_writer):
    """File with every obs-aligned node kind: X (via x_writer), plain +
    categorical (with NaN) + nullable obs columns, obsm, varm, layers."""
    r = np.random.default_rng(7)
    dense = ((r.random((11, 6)) > 0.4) * r.random((11, 6))).astype(np.float32)
    p = str(tmp_path / "rich.h5ad")
    with h5py.File(p, "w") as f:
        x_writer(f, dense)
        obs = f.create_group("obs")
        obs.attrs["_index"] = "_index"
        obs.attrs["column-order"] = np.asarray(["lab", "score", "nn"],
                                               dtype="S")
        obs.create_dataset(
            "_index", data=np.asarray([f"c{i}" for i in range(11)], dtype="S")
        )
        cg = obs.create_group("lab")
        cg.attrs["encoding-type"] = "categorical"
        cg.create_dataset("categories", data=np.asarray(["x", "y"], dtype="S"))
        cg.create_dataset(
            "codes", data=np.asarray([0, 1, -1, 0, 1, 0, -1, 1, 0, 1, 0],
                                     dtype=np.int8)
        )
        obs.create_dataset("score", data=np.arange(11, dtype=np.float64))
        ng = obs.create_group("nn")
        ng.attrs["encoding-type"] = "nullable-integer"
        ng.create_dataset("values", data=np.arange(11, dtype=np.int64))
        ng.create_dataset(
            "mask", data=(np.arange(11) % 4 == 1).astype(np.bool_)
        )
        var = f.create_group("var")
        var.attrs["_index"] = "_index"
        var.create_dataset(
            "_index", data=np.asarray([f"g{i}" for i in range(6)], dtype="S")
        )
        obsm = f.create_group("obsm")
        obsm.create_dataset("emb", data=r.random((11, 3)))
        varm = f.create_group("varm")
        varm.create_dataset("w", data=r.random((6, 2)))
        layers = f.create_group("layers")
        layers.create_dataset("norm", data=dense * 2)
    return p, dense


def _dense_writer(f, dense):
    f.create_dataset("X", data=dense)


def _sparse_writer(fmt):
    from scipy import sparse

    def write(f, dense):
        mat = (sparse.csr_matrix(dense) if fmt == "csr"
               else sparse.csc_matrix(dense))
        g = f.create_group("X")
        g.attrs["encoding-type"] = f"{fmt}_matrix"
        g.attrs["shape"] = dense.shape
        g.create_dataset("data", data=mat.data)
        g.create_dataset("indices", data=mat.indices)
        g.create_dataset("indptr", data=mat.indptr)

    return write


@pytest.mark.parametrize(
    "writer", [_dense_writer, _sparse_writer("csr"), _sparse_writer("csc")],
    ids=["dense", "csr", "csc"],
)
def test_obs_range_read_matches_full_slice(tmp_path, writer):
    """read_h5ad(obs_range=(lo, hi)) must equal slicing the full read, for
    every X encoding and every obs-aligned node (var/varm stay whole)."""
    from alpine_tpu.io.h5ad import h5ad_dims

    p, dense = _write_rich(tmp_path, writer)
    assert h5ad_dims(p) == (11, 6)
    full = read_h5ad(p)
    np.testing.assert_allclose(full.X, dense, rtol=1e-6)
    for lo, hi in [(0, 11), (0, 5), (4, 9), (10, 11), (3, 3)]:
        part = read_h5ad(p, obs_range=(lo, hi))
        np.testing.assert_allclose(part.X, dense[lo:hi], rtol=1e-6)
        assert list(part.obs.index) == list(full.obs.index[lo:hi])
        assert list(part.obs["lab"].fillna("NA")) == list(
            full.obs["lab"].fillna("NA")[lo:hi]
        )
        np.testing.assert_allclose(part.obs["score"],
                                   full.obs["score"][lo:hi])
        assert list(part.obs["nn"].isna()) == list(
            full.obs["nn"].isna()[lo:hi]
        )
        np.testing.assert_allclose(part.obsm["emb"], full.obsm["emb"][lo:hi])
        np.testing.assert_allclose(part.layers["norm"],
                                   full.layers["norm"][lo:hi])
        # var-aligned nodes are never sliced
        assert list(part.var.index) == list(full.var.index)
        np.testing.assert_allclose(part.varm["w"], full.varm["w"])


def test_obs_range_validation(tmp_path):
    p, _ = _write_rich(tmp_path, _dense_writer)
    for bad in [(-1, 4), (3, 2), (0, 12), (12, 12)]:
        with pytest.raises(ValueError, match="obs_range"):
            read_h5ad(p, obs_range=bad)


def test_h5ad_dims_does_not_read_x(tmp_path):
    """h5ad_dims must come from metadata (sparse: the shape attr), not a
    densifying read."""
    from alpine_tpu.io.h5ad import h5ad_dims

    p, dense = _write_rich(tmp_path, _sparse_writer("csr"))
    assert h5ad_dims(p) == dense.shape


@pytest.mark.parametrize("fmt", ["csr", "csc"])
def test_write_sparse_x_stays_sparse(tmp_path, fmt):
    """write_h5ad must keep a sparse X sparse on disk (an atlas-scale count
    matrix must not densify at write time), with the anndata encoding
    attrs, and the file must round-trip — including obs_range reads."""
    r = np.random.default_rng(3)
    dense = ((r.random((10, 7)) > 0.6) * r.random((10, 7))).astype(np.float32)
    mat = sparse.csr_matrix(dense) if fmt == "csr" else sparse.csc_matrix(dense)
    ad = AnnData(mat, obs=pd.DataFrame(index=[f"c{i}" for i in range(10)]),
                 var=pd.DataFrame(index=[f"g{i}" for i in range(7)]))
    ad.layers["counts"] = mat.copy()
    p = str(tmp_path / f"sp_{fmt}.h5ad")
    write_h5ad(ad, p)
    with h5py.File(p, "r") as f:
        assert f["X"].attrs["encoding-type"] == f"{fmt}_matrix"
        assert f["X"].attrs["encoding-version"] == "0.1.0"
        assert tuple(f["X"].attrs["shape"]) == (10, 7)
        assert f["X"]["data"].shape[0] == mat.nnz  # not densified
        assert f["layers"]["counts"].attrs["encoding-type"] == f"{fmt}_matrix"
    back = read_h5ad(p)
    np.testing.assert_allclose(back.X, dense, rtol=1e-6)
    np.testing.assert_allclose(back.layers["counts"], dense, rtol=1e-6)
    part = read_h5ad(p, obs_range=(3, 8))
    np.testing.assert_allclose(part.X, dense[3:8], rtol=1e-6)
    np.testing.assert_allclose(part.layers["counts"], dense[3:8], rtol=1e-6)


def test_write_sparse_x_sums_duplicates_without_mutating(tmp_path):
    """A hand-built COO with duplicate entries must write the TRUE dense
    values (duplicates summed on a copy — the caller's matrix untouched)."""
    coo = sparse.coo_matrix(
        (np.asarray([5.0, -3.0, 1.0]), ([0, 0, 1], [1, 1, 0])), shape=(2, 3)
    )
    nnz_before = coo.nnz
    ad = AnnData(coo, obs=pd.DataFrame(index=["a", "b"]),
                 var=pd.DataFrame(index=["g0", "g1", "g2"]))
    p = str(tmp_path / "dup.h5ad")
    write_h5ad(ad, p)
    assert coo.nnz == nnz_before  # caller's matrix not mutated
    back = read_h5ad(p)
    np.testing.assert_allclose(
        back.X, np.asarray([[0, 2, 0], [1, 0, 0]], np.float32)
    )


def test_nullable_numeric_obs_columns_round_trip(tmp_path):
    """Nullable integer/boolean obs columns (pandas Int64/boolean dtypes,
    or the object int/None columns the reader itself produces) must
    round-trip as NUMBERS + None — the old categorical fallback stringified
    them (1 -> \"1\"), corrupting numeric metadata for scanpy sessions."""
    obs = pd.DataFrame(
        {
            "n_counts": pd.array([5, None, 7], dtype="Int64"),
            "flag": pd.array([True, None, False], dtype="boolean"),
            "obj_int": np.array([1, None, 3], dtype=object),
            "obj_bool": np.array([True, None, False], dtype=object),
            "strings": np.array(["a", None, "b"], dtype=object),
        },
        index=["c0", "c1", "c2"],
    )
    ad = AnnData(np.ones((3, 2), np.float32), obs=obs)
    p = str(tmp_path / "nullable_rt.h5ad")
    write_h5ad(ad, p)
    with h5py.File(p, "r") as f:
        assert f["obs"]["n_counts"].attrs["encoding-type"] == "nullable-integer"
        assert f["obs"]["flag"].attrs["encoding-type"] == "nullable-boolean"
        assert f["obs"]["obj_int"].attrs["encoding-type"] == "nullable-integer"
        assert f["obs"]["obj_bool"].attrs["encoding-type"] == "nullable-boolean"
        assert f["obs"]["strings"].attrs["encoding-type"] == "categorical"
    back = read_h5ad(p)
    assert list(back.obs["n_counts"]) == [5, None, 7]
    assert list(back.obs["flag"]) == [True, None, False]
    assert list(back.obs["obj_int"]) == [1, None, 3]
    assert list(back.obs["obj_bool"]) == [True, None, False]
    s = back.obs["strings"]
    assert list(s[~s.isna()]) == ["a", "b"] and bool(s.isna().iloc[1])
    # and a second write of what the reader produced is stable (the reader
    # emits object columns of ints/None — the exact shape the old code
    # corrupted)
    p2 = str(tmp_path / "nullable_rt2.h5ad")
    write_h5ad(back, p2)
    again = read_h5ad(p2)
    assert list(again.obs["n_counts"]) == [5, None, 7]
    assert list(again.obs["obj_int"]) == [1, None, 3]


def test_object_column_with_pd_na_writes_nullable(tmp_path):
    """pd.NA in an object column (e.g. an Int64 array passed through
    .astype(object)) must be recognized as missing: the old hand-rolled
    None/NaN test let pd.NA through, failed the all-int check, and
    stringified the column via the categorical branch (1 -> \"1\")."""
    obs = pd.DataFrame(
        {
            "na_int": pd.array([1, None, 3], dtype="Int64").astype(object),
            "na_bool": pd.array([True, None, False],
                                dtype="boolean").astype(object),
        },
        index=["c0", "c1", "c2"],
    )
    assert obs["na_int"].iloc[1] is pd.NA  # the shape under test
    ad = AnnData(np.ones((3, 2), np.float32), obs=obs)
    p = str(tmp_path / "pd_na.h5ad")
    write_h5ad(ad, p)
    with h5py.File(p, "r") as f:
        assert f["obs"]["na_int"].attrs["encoding-type"] == "nullable-integer"
        assert f["obs"]["na_bool"].attrs["encoding-type"] == "nullable-boolean"
    back = read_h5ad(p)
    assert list(back.obs["na_int"]) == [1, None, 3]
    assert list(back.obs["na_bool"]) == [True, None, False]


def test_read_h5sparse_legacy_attrs(tmp_path):
    """h5sparse-era files store their format/shape as h5sparse_format /
    h5sparse_shape attrs (no anndata 'encoding-type'/'shape'); both the
    full read and the out-of-core obs_range read must honor them — shape
    first (reads died on the missing 'shape' before the format fallback
    could even fire), and the format attr disambiguates a SQUARE matrix
    whose indptr length fits both axes."""
    from alpine_tpu.io.h5ad import h5ad_dims

    r = np.random.default_rng(3)
    X = ((r.random((6, 6)) < 0.5) * r.random((6, 6))).astype(np.float32)
    for fmt, mat in (("csr", sparse.csr_matrix(X)),
                     ("csc", sparse.csc_matrix(X))):
        p = str(tmp_path / f"h5sparse_{fmt}.h5ad")
        with h5py.File(p, "w") as f:
            g = f.create_group("X")
            g.attrs["h5sparse_format"] = fmt
            g.attrs["h5sparse_shape"] = np.asarray(X.shape, np.int64)
            g.create_dataset("data", data=mat.data)
            g.create_dataset("indices", data=mat.indices)
            g.create_dataset("indptr", data=mat.indptr)
        assert h5ad_dims(p) == (6, 6)
        np.testing.assert_allclose(np.asarray(read_h5ad(p).X), X, rtol=1e-6)
        part = read_h5ad(p, obs_range=(2, 5))
        np.testing.assert_allclose(np.asarray(part.X), X[2:5], rtol=1e-6)


def test_csc_range_read_sums_duplicates_and_respects_dtype(tmp_path):
    """Hand-built non-canonical CSC files carry duplicate entries whose
    dense value is their SUM (what scipy's todense returns); the streamed
    range reader must add, not overwrite.  X densification happens directly
    at float32 (single materialization, half the peak memory of an
    int64/float64 atlas)."""
    p = str(tmp_path / "dupcsc.h5ad")
    with h5py.File(p, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csc_matrix"
        g.attrs["shape"] = (2, 3)
        # column 0 holds (row0: 5.0) and (row0: -3.0) — dense value 2.0
        g.create_dataset("data", data=np.asarray([5.0, -3.0, 4.0], np.float64))
        g.create_dataset("indices", data=np.asarray([0, 0, 1]))
        g.create_dataset("indptr", data=np.asarray([0, 2, 3, 3]))
    expected = np.asarray([[2.0, 0.0, 0.0], [0.0, 4.0, 0.0]], np.float32)
    full = read_h5ad(p)
    assert full.X.dtype == np.float32
    np.testing.assert_allclose(full.X, expected)
    part = read_h5ad(p, obs_range=(0, 1))
    np.testing.assert_allclose(part.X, expected[:1])


def test_chunk_cell_sizes_gathers_before_validating(monkeypatch):
    """A bad local size must reach the allgather (so every rank raises
    together) — raising unilaterally before the collective would leave the
    peers blocked in it forever."""
    from alpine_tpu.parallel import distributed as dist

    class FakePlacement:
        n_processes = 2
        process_chunk_index = 0

    gathered = []

    def fake_gather(row):
        gathered.append(np.asarray(row))
        # what every rank sees: rank 1 reports zero cells
        return np.asarray([[0, 7, 0], [1, 0, 1]], np.int64)

    monkeypatch.setattr(dist, "process_allgather_rows", fake_gather)
    with pytest.raises(ValueError, match="at least one"):
        dist.chunk_cell_sizes(FakePlacement(), 7)
    assert len(gathered) == 1  # the collective ran BEFORE the raise
    # the healthy path orders sizes by chunk index; a chunk order that
    # differs from process order warns about the ingestion-recipe pairing
    monkeypatch.setattr(
        dist, "process_allgather_rows",
        lambda row: np.asarray([[1, 48, 0], [0, 47, 1]], np.int64),
    )
    with pytest.warns(UserWarning, match="chunk order differs"):
        sizes = dist.chunk_cell_sizes(FakePlacement(), 47)
    assert sizes.tolist() == [47, 48]
    # aligned chunk/process order: no warning
    import warnings as _w

    monkeypatch.setattr(
        dist, "process_allgather_rows",
        lambda row: np.asarray([[0, 47, 0], [1, 48, 1]], np.int64),
    )
    with _w.catch_warnings():
        _w.simplefilter("error")
        sizes = dist.chunk_cell_sizes(FakePlacement(), 47)
    assert sizes.tolist() == [47, 48]
    # non-permutation chunk indices (broken mesh ownership) raise clearly
    monkeypatch.setattr(
        dist, "process_allgather_rows",
        lambda row: np.asarray([[0, 48, 0], [0, 47, 1]], np.int64),
    )
    with pytest.raises(ValueError, match="permutation"):
        dist.chunk_cell_sizes(FakePlacement(), 48)


def test_chunk_cell_sizes_ships_placement_errors_through_gather(monkeypatch):
    """process_chunk_index itself can raise (non-contiguous / zero device
    ownership); the failure must ride the allgather as a -1 sentinel so
    every rank raises together instead of one dying before the collective
    and the rest blocking in it forever."""
    from alpine_tpu.parallel import distributed as dist

    class RaisingPlacement:
        n_processes = 2

        @property
        def process_chunk_index(self):
            raise ValueError("devices are not contiguous")

    gathered = []

    def fake_gather(row):
        gathered.append(np.asarray(row))
        return np.asarray([[-1, 48, 0], [0, 47, 1]], np.int64)

    monkeypatch.setattr(dist, "process_allgather_rows", fake_gather)
    with pytest.raises(ValueError, match="not contiguous"):
        dist.chunk_cell_sizes(RaisingPlacement(), 48)
    assert len(gathered) == 1 and gathered[0][0] == -1  # gather ran first

    # the healthy peer's view of the same failure: its own placement is
    # fine, a remote rank shipped the sentinel — it must raise too
    class OkPlacement:
        n_processes = 2
        process_chunk_index = 0

    monkeypatch.setattr(
        dist, "process_allgather_rows",
        lambda row: np.asarray([[-1, 48, 0], [0, 47, 1]], np.int64),
    )
    with pytest.raises(ValueError, match="could not place"):
        dist.chunk_cell_sizes(OkPlacement(), 47)


def test_process_cell_range_arithmetic():
    """Near-equal contiguous split: ranges partition [0, n), sizes differ
    by at most one, the first n%p processes take the extra cell."""
    from alpine_tpu.parallel.distributed import process_cell_range

    for n, p in [(95, 2), (96, 2), (7, 3), (100, 8), (5, 5), (1, 1)]:
        ranges = [process_cell_range(n, p, i) for i in range(p)]
        assert ranges[0][0] == 0 and ranges[-1][1] == n
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b == c and b > a
        sizes = [hi - lo for lo, hi in ranges]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)
    # numpy integer cell counts (e.g. a numpy-derived shape) are accepted
    assert process_cell_range(np.int64(95), 2, 0) == (0, 48)
    with pytest.raises(ValueError, match="at least one"):
        process_cell_range(3, 4, 0)
    with pytest.raises(ValueError, match="out of range"):
        process_cell_range(10, 2, 2)
    with pytest.raises(ValueError, match="positive integer"):
        process_cell_range(0, 1, 0)
