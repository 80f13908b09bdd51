"""Training-data curation operators: benchmark decontamination,
within-document repetition statistics, and deterministic sampling
(stratified top-k per stratum and fractional).

These are first-class large-scale-pipeline operators (not in the
reference's operator set — they extend it the way ``text.py`` and
``dedup.py`` do, per SURVEY.md §2's training-data addendum):

- :func:`decontaminate` flags corpus documents that share any word
  n-gram with a *benchmark* set (the standard eval-set leakage filter
  used before LLM training runs). The benchmark side is small by
  nature (eval suites are thousands of items even for 100-TB corpora),
  so its shingle-hash universe is computed cluster-side, unioned on the
  driver, and broadcast ONCE via ``ray.put``; the corpus side is one
  embarrassingly-parallel ``map_batches`` pass — no shuffle at any
  corpus size.
- :func:`repetition_stats` computes MassiveText-style repetition
  signals (duplicate-word fraction, top-word fraction, duplicate-2-gram
  fraction) per document with fully vectorized numpy kernels over the
  shared word-hash chain (:func:`tenzir_ray.dedup._word_hashes_flat`)
  — no shuffle, no per-row Python.
- :func:`stratified_sample` takes a deterministic k-smallest-rank
  sample per stratum: rank = ``(id * 2654435761) % 1000000007`` (a
  Knuth multiplicative hash kept inside exact int64/ANSI-BIGINT range
  so the DuckDB oracle reproduces it bit-for-bit). Each block prunes to
  its local per-stratum top-k FIRST, so at most ``k × strata × blocks``
  rows enter the one small shuffle — corpus bytes never move.
- :func:`sample_fraction` is the shuffle-free variant: keep rows whose
  rank falls below ``frac`` of the modulus. Pure filter; resharding-
  stable (membership depends only on the id, not on partitioning).
- :func:`weighted_sample` generalizes it to per-stratum rates
  (training-mixture composition) with a dictionary-encoded cut gather.
- :func:`pack_sequences` assigns contiguous-fill token bins
  (pretraining sequence packing) via one distributed sort plus a
  per-block-scalar prefix scan — the driver holds O(blocks) scalars.
- :func:`curate` composes quality gate → decontaminate → exact dedup →
  mixture → packing into the end-to-end streaming pipeline, each stage
  individually oracle-verified and the whole chain oracle-checked as
  one SQL CTE pipeline (``curate_docs``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from tenzir_ray.dedup import (
    _WORD_RE,
    _splitmix64,
    _word_hashes_flat,
    _word_ngram_sets,
)
from tenzir_ray.arrowutil import as_array, ranges

_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

# Knuth multiplicative-hash sampling rank: exact in int64 (ids up to
# ~3.4e9 stay under 2^63 after the multiply) and in ANSI-SQL BIGINT,
# so engine and oracle agree bit-for-bit.
_SAMPLE_MULT = 2654435761
_SAMPLE_MOD = 1_000_000_007

# Loud ceiling for the broadcast benchmark shingle universe (~128M
# shingles = 1 GiB of uint64). Real benchmark suites are orders of
# magnitude below this; crossing it means the "benchmark" side is
# actually a corpus and needs the dedup-style exchange instead.
_MAX_BENCH_SHINGLES = 128_000_000


# ids above this wrap int64 in the multiply, silently diverging from
# ANSI-BIGINT arithmetic (DuckDB raises instead) — fail loudly first
_MAX_SAMPLE_ID = (2**63 - 1) // _SAMPLE_MULT


def _sample_rank(ids: np.ndarray) -> np.ndarray:
    ids = ids.astype(np.int64)
    if len(ids) and (
        int(ids.max()) > _MAX_SAMPLE_ID or int(ids.min()) < 0
    ):
        raise ValueError(
            f"sampling ids must be in [0, {_MAX_SAMPLE_ID}] for exact "
            "BIGINT-parity with the SQL oracle (the Knuth multiply would "
            "wrap int64); re-key or hash ids into range first"
        )
    return (ids * _SAMPLE_MULT) % _SAMPLE_MOD


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def benchmark_ngram_set(
    bench: Dataset, text_col: str = "text", n: int = 3
) -> "ray.ObjectRef":
    """Union of the benchmark set's word-n-gram hashes, computed
    cluster-side (one vectorized pass per block, per-block unique) and
    broadcast once via ``ray.put``.

    The driver holds only the deduplicated uint64 universe — bounded by
    the benchmark's distinct-shingle count, which is small by contract
    (loud error past ``_MAX_BENCH_SHINGLES``)."""

    def per_block(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sets = _word_ngram_sets(texts, n)
        u = (
            np.unique(np.concatenate(sets))
            if sets
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table({"sh": pa.array(u, type=pa.uint64())})

    # fold the union incrementally so the driver's peak is
    # universe + ONE block (not the sum of all per-block uniques)
    universe = np.empty(0, dtype=np.uint64)
    for b in bench.map_batches(per_block, **_PYARROW).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        part = b["sh"].to_numpy(zero_copy_only=False)
        universe = np.union1d(universe, part)
        if len(universe) > _MAX_BENCH_SHINGLES:
            raise ValueError(
                f"benchmark n-gram universe exceeds {_MAX_BENCH_SHINGLES} "
                "distinct shingles; this side is corpus-sized — use the "
                "dedup exchange path (dedup.dedup_ngram_jaccard) instead of "
                "broadcast decontamination"
            )
    return ray.put(universe)  # sorted by np.union1d


def _decontaminate_fn(bench_ref, text_col: str, n: int):
    """Per-batch kernel with the benchmark universe closure-captured as
    an ObjectRef: ``ray.get`` inside the task is a zero-copy local
    plasma read after the first fetch per node (the brief's broadcast
    pattern), and a plain task pool avoids Ray's actor-restart warning
    about ObjectRefs in actor constructor args."""

    def apply(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        texts = t[text_col].to_pylist()
        sets = _word_ngram_sets(texts, n)
        counts = np.fromiter((len(s) for s in sets), np.int64, len(sets))
        flat = (
            np.concatenate(sets) if sets else np.empty(0, dtype=np.uint64)
        )
        if len(bench):
            pos = np.searchsorted(bench, flat)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == flat
        else:
            hit = np.zeros(len(flat), dtype=bool)
        # per-doc distinct overlapping shingles (sets are already
        # per-doc unique, so a segment sum of hits is the distinct count)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        n_hits = np.add.reduceat(
            np.concatenate([hit.astype(np.int64), [0]]), bounds[:-1]
        )
        n_hits[counts == 0] = 0
        return t.append_column(
            "n_hits", pa.array(n_hits, type=pa.int64())
        ).append_column("contaminated", pa.array(n_hits > 0))

    return apply


def decontaminate(
    ds: Dataset,
    bench: Dataset,
    text_col: str = "text",
    n: int = 3,
    concurrency=None,
) -> Dataset:
    """Flag corpus rows sharing any word n-gram with ``bench``.

    Adds ``contaminated`` (bool) and ``n_hits`` (int64 distinct
    overlapping n-grams). Filter with ``ops.where`` to drop. Word and
    n-gram semantics match :func:`tenzir_ray.dedup._word_ngram_sets`
    (lowered ``[a-z0-9]+`` words; docs shorter than ``n`` words
    contribute one whole-doc shingle; empty docs none) so the DuckDB
    oracle reproduces them string-wise."""
    ref = benchmark_ngram_set(bench, text_col, n)
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return ds.map_batches(
        _decontaminate_fn(ref, text_col, n), **kwargs, **_PYARROW
    )


# ---------------------------------------------------------------------------
# within-document repetition statistics
# ---------------------------------------------------------------------------


def _segment_distinct_top(
    h: np.ndarray, counts: np.ndarray
) -> "tuple[np.ndarray, np.ndarray]":
    """Per-segment (distinct count, max run count) over flat hash array
    ``h`` segmented by ``counts`` — one lexsort, no per-doc Python."""
    ndocs = len(counts)
    distinct = np.zeros(ndocs, dtype=np.int64)
    top = np.zeros(ndocs, dtype=np.int64)
    if len(h) == 0:
        return distinct, top
    doc_idx = np.repeat(np.arange(ndocs), counts)
    order = np.lexsort((h, doc_idx))
    dv, hv = doc_idx[order], h[order]
    newrun = np.empty(len(hv), dtype=bool)
    newrun[0] = True
    np.logical_or(dv[1:] != dv[:-1], hv[1:] != hv[:-1], out=newrun[1:])
    run_starts = np.flatnonzero(newrun)
    run_len = np.diff(np.append(run_starts, len(hv)))
    run_doc = dv[run_starts]
    distinct = np.bincount(run_doc, minlength=ndocs)
    present, first = np.unique(run_doc, return_index=True)
    top[present] = np.maximum.reduceat(run_len, first)
    return distinct.astype(np.int64), top


def _repetition_table(texts: List[Optional[str]]) -> "dict[str, pa.Array]":
    docs = [_WORD_RE.findall(t.lower()) if t else [] for t in texts]
    wh, nw = _word_hashes_flat(docs)
    ndocs = len(docs)
    # distinct words + top word count per doc
    dw, topw = _segment_distinct_top(wh, nw)
    # all 2-gram hashes (duplicates KEPT — unlike _word_ngram_sets)
    n2 = np.maximum(nw - 1, 0)
    dbound = np.concatenate([[0], np.cumsum(nw)])
    ws = np.repeat(dbound[:-1], n2) + ranges(n2)
    acc = np.zeros(len(ws), dtype=np.uint64)
    for j in range(2):
        acc = _splitmix64(acc ^ wh[ws + j])
    d2, _ = _segment_distinct_top(acc, n2)
    nwf = nw.astype(np.float64)
    n2f = n2.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        dup_w = np.where(nw > 0, (nwf - dw) / nwf, np.nan)
        top_w = np.where(nw > 0, topw / nwf, np.nan)
        dup_2 = np.where(n2 > 0, (n2f - d2) / n2f, np.nan)
    def col(v, valid):
        return pa.array(v, type=pa.float64(), mask=~valid)
    return {
        "n_words": pa.array(nw, type=pa.int64()),
        "dup_word_frac": col(dup_w, nw > 0),
        "top_word_frac": col(top_w, nw > 0),
        "dup_2gram_frac": col(dup_2, n2 > 0),
    }


def repetition_stats(ds: Dataset, text_col: str = "text") -> Dataset:
    """Per-document repetition signals (the MassiveText quality-filter
    family): ``n_words``, ``dup_word_frac`` (1 - distinct/total words),
    ``top_word_frac`` (most frequent word's share), ``dup_2gram_frac``
    (1 - distinct/total word 2-grams). NULL where the denominator is
    zero. Words are lowered ``[a-z0-9]+`` runs; duplicate detection is
    over 64-bit splitmix hashes (collision odds are negligible and the
    driver's oracle gate would surface one).

    Shuffle-free: one vectorized ``map_batches`` pass."""

    def apply(t: pa.Table) -> pa.Table:
        cols = _repetition_table(t[text_col].to_pylist())
        for name, arr in cols.items():
            t = t.append_column(name, arr)
        return t

    return ds.map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


def sample_fraction(ds: Dataset, id_col: str, frac: float) -> Dataset:
    """Deterministic ~``frac`` sample: keep rows with
    ``(id * 2654435761) % 1000000007 < frac * 1000000007``. Pure
    filter — no shuffle, membership independent of partitioning, and
    exactly reproducible in ANSI SQL."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    cut = int(frac * _SAMPLE_MOD)

    def apply(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_sample_rank(ids) < cut))

    return ds.map_batches(apply, **_PYARROW)


def stratified_sample(
    ds: Dataset, strata_col: str, id_col: str, k: int
) -> Dataset:
    """Deterministic k rows per stratum: the k smallest
    ``(rank, id)`` pairs, rank = Knuth hash of the id (ties impossible
    since ids are unique within a stratum).

    Scale shape: each block first prunes to its LOCAL per-stratum
    top-k (vectorized lexsort + per-group cumcount), so at most
    ``k × strata × blocks`` rows — not corpus rows — enter the single
    small ``groupby(strata).map_groups`` that picks global winners."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def prune(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        rank = _sample_rank(ids)
        enc = pc.dictionary_encode(as_array(t[strata_col]))
        # null strata -> null indices; fold them into ONE group (-1) so
        # the prune bounds them at k like any other stratum instead of
        # shipping every null row into the shuffle
        g = (
            pc.fill_null(enc.indices, -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.lexsort((ids, rank, g))
        gs = g[order]
        first_new = np.empty(len(gs), dtype=bool)
        if len(gs):
            first_new[0] = True
            np.not_equal(gs[1:], gs[:-1], out=first_new[1:])
        pos = np.arange(len(gs)) - np.maximum.accumulate(
            np.where(first_new, np.arange(len(gs)), 0)
        )
        keep = np.zeros(len(gs), dtype=bool)
        keep[order[pos < k]] = True
        return t.filter(pa.array(keep))

    def winners(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, _sample_rank(ids)))
        return t.take(pa.array(order[:k]))

    pruned = ds.map_batches(prune, **_PYARROW)
    return pruned.groupby(strata_col).map_groups(
        winners, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# sequence packing (LLM-pretraining bin assignment)
# ---------------------------------------------------------------------------


def pack_sequences(
    ds: Dataset,
    token_col: str,
    budget: int,
    order_col: str,
    out_col: str = "bin_id",
) -> Dataset:
    """Assign each document to a training-sequence bin of ~``budget``
    tokens by contiguous fill in ``order_col`` order:
    ``bin_id = (exclusive running sum of token_col) // budget`` — the
    deterministic streaming-fill packing used to build fixed-length
    pretraining batches. A document that straddles a boundary belongs
    to the bin where it starts (bins overflow by at most one doc).

    Distributed as a classic two-pass scan (no driver-side rows):

    1. one distributed range-partition sort by ``order_col``;
    2. a tiny per-block task reduces each block to ONE scalar (its
       token sum); the driver prefix-sums the per-block scalars —
       bytes on the driver = O(blocks), never rows;
    3. each block assigns bins from its offset + an in-block exclusive
       cumsum, in parallel.

    The same shape (sort → per-block scalar metadata → driver prefix →
    parallel assign) as :func:`tenzir_ray.ops.window.sessionize_sorted`.
    Token counts must be non-negative integers (compose with
    ``text.token_count`` / ``text.bpe_token_count``)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")

    sorted_ds = ds.sort(order_col)
    # per-plan context copy: flipping preserve_order affects only this
    # lineage (the sessionize_sorted precedent)
    lineage_ctx = sorted_ds.context
    prev_order = lineage_ctx.execution_options.preserve_order
    lineage_ctx.execution_options.preserve_order = True
    try:
        mat = sorted_ds.materialize()
        refs = mat.to_arrow_refs()
    finally:
        lineage_ctx.execution_options.preserve_order = prev_order

    def _tokens(t: pa.Table) -> np.ndarray:
        """Validated int64 token counts: nulls/negatives would silently
        corrupt every downstream bin id (NaN -> INT64_MIN), so they
        fail loudly instead."""
        col = t[token_col]
        if col.null_count:
            raise ValueError(
                f"pack_sequences: {token_col!r} contains nulls; fill or "
                "filter them first (a null token count has no bin)"
            )
        n = col.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(n) and int(n.min()) < 0:
            raise ValueError(
                f"pack_sequences: {token_col!r} contains negative counts"
            )
        return n

    @ray.remote(num_cpus=0.25)
    def _block_sum(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        return int(np.sum(_tokens(t)))

    sums = ray.get([_block_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote
    def _assign(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        n = _tokens(t)
        excl = off + np.cumsum(n) - n
        return t.append_column(
            out_col, pa.array(excl // budget, type=pa.int64())
        ).replace_schema_metadata(None)

    out_refs = [_assign.remote(r, int(o)) for r, o in zip(refs, offsets)]
    import ray.data as _rd

    from tenzir_ray.arrowutil import from_arrow_refs_retried

    return from_arrow_refs_retried(out_refs)


def weighted_sample(
    ds: Dataset,
    strata_col: str,
    id_col: str,
    fracs: "dict[str, float]",
    default_frac: float = 0.0,
) -> Dataset:
    """Training-mixture composition: keep each row with a per-stratum
    deterministic probability (``fracs[stratum]``, else
    ``default_frac``) using the same Knuth-hash rank as
    :func:`sample_fraction` — shuffle-free, reshard-stable, exactly
    reproducible in SQL with a CASE expression."""
    for k, f in list(fracs.items()) + [("default", default_frac)]:
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"frac for {k!r} must be in [0, 1], got {f}")
    cuts = {k: int(f * _SAMPLE_MOD) for k, f in fracs.items()}
    default_cut = int(default_frac * _SAMPLE_MOD)

    def apply(t: pa.Table) -> pa.Table:
        rank = _sample_rank(t[id_col].to_numpy(zero_copy_only=False))
        # vectorized per-stratum cut: python-map only the DISTINCT
        # strata (dictionary encode), then one gather
        enc = pc.dictionary_encode(as_array(t[strata_col]))
        uniq_cuts = np.fromiter(
            (cuts.get(s, default_cut) for s in enc.dictionary.to_pylist()),
            np.int64,
            len(enc.dictionary),
        )
        # null strata -> null indices; treat them as default_frac
        idx = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
        idx = idx.astype(np.int64)
        cut = np.where(
            idx >= 0,
            uniq_cuts[idx] if len(uniq_cuts) else default_cut,
            default_cut,
        )
        return t.filter(pa.array(rank < cut))

    return ds.map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# end-to-end curation pipeline
# ---------------------------------------------------------------------------


def curate(
    ds: Dataset,
    bench: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    max_dup_word_frac: float = 0.6,
    min_words: int = 5,
    lang_fracs: "Optional[dict[str, float]]" = None,
    default_frac: float = 1.0,
    pack_budget: int = 512,
) -> Dataset:
    """The full training-data preparation chain, each stage an
    already-verified operator, composed the streaming way (every stage
    is a batch transform; the only shuffles are exact-dedup's bucketed
    groupby and packing's sort):

    1. repetition/quality gate: drop docs with
       ``dup_word_frac > max_dup_word_frac`` or fewer than
       ``min_words`` words;
    2. benchmark decontamination: drop docs sharing any word 3-gram
       with ``bench``;
    3. exact dedup on the text (min-id winner);
    4. per-language mixture sampling (``lang_fracs``);
    5. whitespace token counts → contiguous-fill packing into
       ``pack_budget``-token bins.

    Returns (id, lang, n_words, n_tokens, bin_id)-shaped rows ready to
    group into training sequences."""
    from tenzir_ray import text as _text
    from tenzir_ray.dedup import dedup_exact

    ds = repetition_stats(ds, text_col)

    def gate(t: pa.Table) -> pa.Table:
        nw = t["n_words"].to_numpy(zero_copy_only=False)
        dup = np.nan_to_num(
            t["dup_word_frac"].to_numpy(zero_copy_only=False), nan=1.0
        )
        return t.filter(pa.array((nw >= min_words) & (dup <= max_dup_word_frac)))

    ds = ds.map_batches(gate, **_PYARROW)
    ds = decontaminate(ds, bench, text_col, n=3)
    ds = ds.map_batches(
        lambda t: t.filter(pc.invert(t["contaminated"].combine_chunks())),
        **_PYARROW,
    )
    keep = dedup_exact(ds, text_col, id_col)
    if lang_fracs:
        keep = weighted_sample(keep, lang_col, id_col, lang_fracs, default_frac)
    counted = _text.token_count(keep, text_col)
    packed = pack_sequences(counted, "n_tokens", pack_budget, order_col=id_col)
    drop_cols = (
        text_col,
        "dup_word_frac",
        "top_word_frac",
        "dup_2gram_frac",
        "n_hits",
        "contaminated",
    )

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in drop_cols if c in t.column_names])

    return packed.map_batches(strip, **_PYARROW)
