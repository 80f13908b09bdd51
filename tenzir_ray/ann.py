"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute` — exact cosine top-k: the query matrix is
  broadcast ONCE (``ray.put``), each batch does one numpy matmul and
  emits its local top-k; a tiny driver-side merge reduces
  batches×k candidates to the global top-k. The payload never
  shuffles; only (query_id, vec_id, score) triples move.
- :func:`knn_ivf` — the scale path: coarse k-means centroids fitted on
  a driver-side SAMPLE, vectors assigned to their nearest centroid in
  one pass, queries probe only ``nprobe`` nearest lists. Same
  broadcast + local-topk + small-merge shape, over a pruned subset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

# batch_size=None = one whole block per batch: every kernel here is
# vectorized, so Ray's 1024-row default would only add per-batch overhead
_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _to_matrix(col) -> np.ndarray:
    # reshape straight off the Arrow list buffers — the former
    # to_pandas() hop boxed every vector into a Python object per batch
    from tenzir_ray.arrowutil import list_matrix

    return list_matrix(col, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_brute(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k. Returns a DataFrame
    (query_id, rank, vec_id, score) — deterministic tie-break on
    (score desc, vec_id asc)."""
    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    q_ref = ray.put(qn)

    def local_topk(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        vecs = _normalize(_to_matrix(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sims = vecs @ q.T  # (n, nq)
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            s = sims[:, qi]
            # top-k by score desc then id asc (lexsort keys reversed)
            top = np.lexsort((ids, -s))[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, **_PYARROW).to_pandas()
    cand = cand.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
    out = cand.groupby("query_id", group_keys=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount()
    return out[["query_id", "rank", id_col, "score"]]


class IVFIndex:
    """Coarse inverted-file index: k-means centroids + per-vector list
    assignment (stored as an extra column)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids)

    @classmethod
    def fit(cls, ds: Dataset, vec_col: str, n_lists: int = 16, sample_n: int = 2048, seed: int = 3, iters: int = 10):
        """Fit centroids on a sample (driver-side numpy Lloyd's — the
        sample is small by construction; the full data never leaves
        the cluster)."""
        sample = _to_matrix(
            pa.concat_tables(
                [pa.table(b) for b in ds.limit(sample_n).iter_batches(batch_format="pyarrow")]
            )[vec_col]
        )
        rng = np.random.default_rng(seed)
        cent = sample[rng.choice(len(sample), min(n_lists, len(sample)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(_normalize(sample) @ _normalize(cent).T, axis=1)
            for c in range(len(cent)):
                members = sample[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        return cls(cent)

    def assign(self, ds: Dataset, vec_col: str = "embedding") -> Dataset:
        cent_ref = ray.put(self.centroids)

        def tag(t: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            lists = np.argmax(_normalize(_to_matrix(t[vec_col])) @ cents.T, axis=1)
            return t.append_column("__ivf_list", pa.array(lists, type=pa.int64()))

        return ds.map_batches(tag, **_PYARROW)

    # -- persistence (VERDICT: repeated queries must skip re-fit/re-assign) --

    def save(self, path: str, ds: Optional[Dataset] = None, vec_col: str = "embedding") -> str:
        """Persist the index: centroids as a tiny parquet + (when ``ds``
        is given) the tagged vectors written HIVE-PARTITIONED by IVF
        list (``__ivf_list=K/``), so a later query READS ONLY the
        probed lists' files — the pruning happens at the directory
        listing, before any bytes load."""
        import os

        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        cent = pa.table(
            {"list_id": pa.array(range(len(self.centroids)), type=pa.int64()),
             "centroid": pa.array(self.centroids.tolist(), type=pa.list_(pa.float64()))}
        )
        pq.write_table(cent, os.path.join(path, "centroids.parquet"))
        if ds is not None:
            self.assign(ds, vec_col).write_parquet(
                os.path.join(path, "vectors"), partition_cols=["__ivf_list"],
                compression="zstd",
            )
        return path

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        import os

        import pyarrow.parquet as pq

        from tenzir_ray.arrowutil import list_matrix

        t = pq.read_table(os.path.join(path, "centroids.parquet"))
        order = np.argsort(t["list_id"].to_numpy())
        cents = list_matrix(t["centroid"])[order]
        return cls(cents)


def read_ivf_lists(path: str, lists) -> Dataset:
    """Pruned read of a saved index: only the requested
    ``__ivf_list=K`` partitions are listed and loaded."""
    import os

    import ray.data

    dirs = [
        os.path.join(path, "vectors", f"__ivf_list={int(l)}")
        for l in sorted(set(int(x) for x in lists))
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    def conform(t: pa.Table, _lid: int) -> pa.Table:
        # Ray recovers the hive partition value as a column (string-
        # typed); normalize to int64, or materialize it when absent
        if "__ivf_list" in t.column_names:
            i = t.column_names.index("__ivf_list")
            return t.set_column(i, "__ivf_list", t["__ivf_list"].cast(pa.int64()))
        return t.append_column("__ivf_list", pa.array([_lid] * t.num_rows, type=pa.int64()))

    parts = []
    for d in dirs:
        lid = int(d.rsplit("=", 1)[1])
        sub = ray.data.read_parquet(d)
        parts.append(sub.map_batches(conform, fn_kwargs={"_lid": lid}, **_PYARROW))
    if not parts:
        raise FileNotFoundError(f"no IVF partitions under {path} for lists {lists}")
    ds = parts[0]
    return ds.union(*parts[1:]) if len(parts) > 1 else ds


def knn_ivf_saved(
    path: str,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> pd.DataFrame:
    """Query a saved IVF index: no k-means, no re-assignment, and only
    the probed partitions' parquet files are read."""
    index = IVFIndex.load(path)
    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe_lists = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :nprobe]
    ds = read_ivf_lists(path, probe_lists.ravel())
    return knn_ivf(ds, queries, k=k, vec_col=vec_col, id_col=id_col,
                   nprobe=nprobe, index=index, _pretagged=True,
                   _probe_lists=probe_lists)


def knn_ivf(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    nprobe: int = 4,
    index: Optional[IVFIndex] = None,
    _pretagged: bool = False,
    _probe_lists: Optional[np.ndarray] = None,
) -> pd.DataFrame:
    """Approximate cosine top-k probing only ``nprobe`` IVF lists per
    query. Recall < 1.0 by design; raise nprobe to trade speed for
    recall."""
    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    if index is None:
        index = IVFIndex.fit(ds, vec_col, n_lists=n_lists)
    tagged = ds if _pretagged else index.assign(ds, vec_col)
    if _probe_lists is not None:
        probe_lists = _probe_lists
    else:
        probe_lists = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    allowed = {qi: set(row.tolist()) for qi, row in enumerate(probe_lists)}
    allowed_ref = ray.put(allowed)
    q_ref = ray.put(qn)

    def local_topk(t: pa.Table) -> pa.Table:
        q, allow = ray.get(q_ref), ray.get(allowed_ref)
        vecs = _normalize(_to_matrix(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        lists = t["__ivf_list"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(lists, list(allow[qi]))
            if not mask.any():
                continue
            s = vecs[mask] @ q[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            top = np.lexsort((sub_ids, -s))[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(sub_ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = tagged.map_batches(local_topk, **_PYARROW).to_pandas()
    if cand.empty:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    cand = cand.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
    out = cand.groupby("query_id", group_keys=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount()
    return out[["query_id", "rank", id_col, "score"]]
