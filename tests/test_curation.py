"""Curation operators: decontamination, repetition stats, sampling."""

import collections
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tenzir_ray import curation

_W = re.compile(r"[a-z0-9]+")


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))


def test_decontaminate_flags_overlap():
    bench = _docs(["alpha beta gamma delta"], ids=[100])
    corpus = _docs(
        [
            "zzz alpha beta gamma yyy",  # shares 3-gram "alpha beta gamma"
            "completely unrelated words here",
            "",  # empty: never contaminated
            "alpha beta",  # <3 words, whole-doc shingle != any bench shingle
        ]
    )
    out = (
        curation.decontaminate(corpus, bench, n=3, concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [True, False, False, False]
    assert out["n_hits"].tolist() == [1, 0, 0, 0]


def test_decontaminate_short_doc_whole_shingle():
    # a <n-word benchmark doc contributes ONE whole-doc shingle; an
    # identical short corpus doc matches it
    bench = _docs(["foo bar"], ids=[7])
    corpus = _docs(["foo bar", "foo baz"])
    out = (
        curation.decontaminate(corpus, bench, n=3, concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [True, False]


def test_decontaminate_bench_universe_guard(monkeypatch):
    monkeypatch.setattr(curation, "_MAX_BENCH_SHINGLES", 2)
    bench = _docs(["a b c d e f g h i j"])
    with pytest.raises(ValueError, match="corpus-sized"):
        curation.benchmark_ngram_set(bench)


def test_repetition_stats_matches_bruteforce():
    texts = [
        "the cat the cat sat",
        "a b c",
        "",
        None,
        "x x x x",
        "one",
        "w1 w2 w1 w2 w1",
    ]
    out = (
        curation.repetition_stats(_docs(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, txt in enumerate(texts):
        ws = _W.findall(txt.lower()) if txt else []
        nw = len(ws)
        assert out.loc[i, "n_words"] == nw
        if nw:
            c = collections.Counter(ws)
            assert out.loc[i, "dup_word_frac"] == pytest.approx((nw - len(c)) / nw)
            assert out.loc[i, "top_word_frac"] == pytest.approx(
                max(c.values()) / nw
            )
        else:
            assert np.isnan(out.loc[i, "dup_word_frac"])
        bi = [tuple(ws[j : j + 2]) for j in range(nw - 1)]
        if bi:
            c2 = collections.Counter(bi)
            assert out.loc[i, "dup_2gram_frac"] == pytest.approx(
                (len(bi) - len(c2)) / len(bi)
            )
        else:
            assert np.isnan(out.loc[i, "dup_2gram_frac"])


def _events(n=500):
    rng = np.random.default_rng(3)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "event_type": rng.choice(["a", "b", "c"], size=n).tolist(),
            }
        )
    )


def test_stratified_sample_exact_winners():
    ds = _events()
    out = (
        curation.stratified_sample(ds, "event_type", "event_id", k=10)
        .to_pandas()
        .sort_values(["event_type", "event_id"])
    )
    full = ds.to_pandas()
    full["rank"] = (full["event_id"] * 2654435761) % 1000000007
    for g, grp in full.groupby("event_type"):
        want = set(
            grp.sort_values(["rank", "event_id"]).head(10)["event_id"]
        )
        got = set(out[out["event_type"] == g]["event_id"])
        assert got == want, g
    assert len(out) == 30


def test_stratified_sample_partition_invariant():
    ds = _events()
    a = curation.stratified_sample(
        ds.repartition(1), "event_type", "event_id", k=5
    ).to_pandas()
    b = curation.stratified_sample(
        ds.repartition(7), "event_type", "event_id", k=5
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["event_type", "event_id"]].values))
    assert key(a) == key(b)


def test_sample_fraction_deterministic_and_reshard_stable():
    ds = _events()
    a = curation.sample_fraction(ds, "event_id", 0.2).to_pandas()
    b = curation.sample_fraction(ds.repartition(7), "event_id", 0.2).to_pandas()
    assert sorted(a["event_id"]) == sorted(b["event_id"])
    # membership formula exact
    keep = (a["event_id"] * 2654435761) % 1000000007
    assert (keep < int(0.2 * 1000000007)).all()
    # roughly the asked fraction
    assert 0.1 < len(a) / 500 < 0.3


def test_sample_fraction_validates():
    with pytest.raises(ValueError):
        curation.sample_fraction(_events(), "event_id", 1.5)
    with pytest.raises(ValueError):
        curation.stratified_sample(_events(), "event_type", "event_id", k=0)


def test_tql_curation_verbs(tmp_path):
    from tenzir_ray import tql

    bench = pa.table({"doc_id": [9], "text": ["alpha beta gamma delta"]})
    import pyarrow.parquet as pq

    bp = str(tmp_path / "bench.parquet")
    pq.write_table(bench, bp)
    ds = _docs(["alpha beta gamma zzz", "unrelated text entirely"])
    out = tql.run(f"decontaminate {bp} text 3", ds).to_pandas().sort_values("doc_id")
    assert out["contaminated"].tolist() == [True, False]

    rep = tql.run("repetition", _docs(["x x x", "a b"])).to_pandas().sort_values("doc_id")
    assert rep["dup_word_frac"].tolist() == pytest.approx([2 / 3, 0.0])

    ev = _events(100)
    frac = tql.run("sample 0.5 event_id", ev).to_pandas()
    assert 20 < len(frac) < 80
    strat = tql.run("sample 4 per event_type by event_id", ev).to_pandas()
    assert len(strat) == 12


def test_redact_pii():
    from tenzir_ray import text, tql

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": [0, 1, 2],
                "note": [
                    "mail bob.smith+x@corp.io or 10.1.2.3",
                    "call +1 555-123-4567; backup 555 987 6543",
                    "nothing to scrub",
                ],
            }
        )
    )
    out = text.redact(ds, "note").to_pandas().sort_values("id")
    assert out["note"].tolist() == [
        "mail <EMAIL> or <IP>",
        "call <PHONE>; backup <PHONE>",
        "nothing to scrub",
    ]
    out2 = tql.run("redact note", ds).to_pandas().sort_values("id")
    assert out2["note"].tolist() == out["note"].tolist()


def test_pack_sequences_contiguous_fill():
    n = 200
    rng = np.random.default_rng(11)
    toks = rng.integers(1, 50, size=n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(n, dtype=np.int64), "n_tokens": toks})
    ).repartition(5)
    out = (
        curation.pack_sequences(ds, "n_tokens", budget=100, order_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    excl = np.concatenate([[0], np.cumsum(toks)[:-1]])
    assert out["bin_id"].tolist() == (excl // 100).tolist()
    # each bin's docs are contiguous in order and start below the boundary
    sizes = out.groupby("bin_id")["n_tokens"].sum()
    # every bin except possibly the last holds >= budget - max_doc + 1 tokens
    assert (sizes.iloc[:-1] >= 100 - 49).all()


def test_pack_sequences_validates():
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "n_tokens": [5]}))
    with pytest.raises(ValueError):
        curation.pack_sequences(ds, "n_tokens", budget=0, order_col="doc_id")


def test_tql_pack_verb():
    from tenzir_ray import tql

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "n_tokens": [60, 60, 60]})
    )
    out = tql.run("pack n_tokens 100 by doc_id", ds).to_pandas().sort_values("doc_id")
    assert out["bin_id"].tolist() == [0, 0, 1]


def test_weighted_sample_per_stratum():
    n = 1000
    rng = np.random.default_rng(5)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": np.arange(n, dtype=np.int64),
                "g": rng.choice(["hot", "cold"], size=n).tolist(),
            }
        )
    )
    out = curation.weighted_sample(ds, "g", "id", {"hot": 0.9}, default_frac=0.05).to_pandas()
    rates = out.groupby("g").size() / pa.table({"g": ds.to_pandas().g}).to_pandas().groupby("g").size()
    assert rates["hot"] > 0.8
    assert rates.get("cold", 0) < 0.15
    # reshard-stable
    out2 = curation.weighted_sample(
        ds.repartition(9), "g", "id", {"hot": 0.9}, default_frac=0.05
    ).to_pandas()
    assert sorted(out.id) == sorted(out2.id)
    with pytest.raises(ValueError):
        curation.weighted_sample(ds, "g", "id", {"hot": 2.0})


def test_curate_end_to_end():
    bench = _docs(["alpha beta gamma delta epsilon"], ids=[1000])
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "text": [
                    "one two three four five six seven",      # clean, kept
                    "alpha beta gamma other words here too",   # contaminated
                    "spam spam spam spam spam spam",           # repetitive
                    "one two three four five six seven",       # exact dup of 1
                    "short doc",                               # < 5 words
                    "eight nine ten eleven twelve thirteen",   # clean, kept
                ],
                "lang": ["en"] * 6,
            }
        )
    )
    out = (
        curation.curate(corpus, bench, lang_fracs={"en": 1.0})
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [1, 6]
    assert set(out.columns) == {"doc_id", "lang", "n_words", "n_tokens", "bin_id"}
    assert out["bin_id"].tolist() == [0, 0]


def test_weighted_sample_null_stratum_uses_default():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": np.arange(100, dtype=np.int64),
                "g": [None] * 100,
            }
        )
    )
    out = curation.weighted_sample(ds, "g", "id", {"hot": 0.0}, default_frac=1.0)
    assert out.count() == 100
    out0 = curation.weighted_sample(ds, "g", "id", {"hot": 1.0}, default_frac=0.0)
    assert out0.count() == 0


def test_pack_sequences_with_empty_blocks():
    # a filter that empties some blocks must not break the block scan
    n = 100
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "n_tokens": np.full(n, 10, dtype=np.int64),
            }
        )
    ).repartition(10)
    ds = ds.map_batches(
        lambda t: t.filter(pa.array(t["doc_id"].to_numpy() < 25)),
        batch_format="pyarrow",
    )
    out = (
        curation.pack_sequences(ds, "n_tokens", budget=100, order_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == 25
    assert out["bin_id"].tolist() == [i * 10 // 100 for i in range(25)]


def test_review_fix_guards():
    # sample-rank overflow guard (ids past int64-exact range fail loudly)
    with pytest.raises(ValueError, match="BIGINT-parity"):
        curation._sample_rank(np.array([4_000_000_000], dtype=np.int64))
    # pack_sequences rejects null token counts instead of emitting garbage
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "n_tokens": pa.array([5, None], type=pa.int64())})
    )
    with pytest.raises(Exception, match="nulls"):
        curation.pack_sequences(ds, "n_tokens", budget=10, order_col="doc_id").materialize()
    # null strata are pruned as one group, not kept wholesale
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "id": np.arange(50, dtype=np.int64),
                "g": [None] * 50,
            }
        )
    ).repartition(1)
    # prune stage alone must bound nulls at k: run full op, expect k rows
    out = curation.stratified_sample(ds2, "g", "id", k=3).to_pandas()
    assert len(out) == 3


def test_lag_col_block_boundaries():
    from tenzir_ray.ops.window import lag_col

    n = 300
    rng = np.random.default_rng(2)
    t = pa.table(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 3, n),  # hot keys -> span sorted blocks
            "v": np.arange(n, dtype=np.float64),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    out = (
        lag_col(ds, "v", "k", ["id"], out_col="pv")
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    want = t.to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    want["pv"] = want.groupby("k")["v"].shift()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_tql_lag_verb():
    from tenzir_ray import tql

    ds = ray.data.from_arrow(
        pa.table({"k": [1, 1, 2], "t": [1, 2, 1], "v": [5.0, 7.0, 9.0]})
    )
    out = tql.run("lag v by k order t", ds).to_pandas().sort_values(["k", "t"])
    assert out["v_lag"].tolist()[1] == 5.0
    assert np.isnan(out["v_lag"].tolist()[0]) and np.isnan(out["v_lag"].tolist()[2])


def test_lead_col():
    from tenzir_ray.ops.window import lead_col

    t = pa.table({"k": [1, 1, 1, 2], "t": [1, 2, 3, 1], "v": [5.0, 7.0, 9.0, 4.0]})
    out = (
        lead_col(ray.data.from_arrow(t).repartition(3), "v", "k", ["t"])
        .to_pandas()
        .sort_values(["k", "t"])
    )
    vals = out["v_lead"].tolist()
    assert vals[:2] == [7.0, 9.0]
    assert np.isnan(vals[2]) and np.isnan(vals[3])


def test_cumsum_col_spanning_blocks():
    from tenzir_ray.ops.window import cumsum_col

    n = 300
    rng = np.random.default_rng(9)
    t = pa.table(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 2, n),  # two hot keys span every block
            "v": rng.normal(size=n),  # negatives exercise non-monotone runs
        }
    )
    ds = ray.data.from_arrow(t).repartition(7)
    out = (
        cumsum_col(ds, "v", "k", ["id"], out_col="rs")
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    want["rs"] = want.groupby("k")["v"].cumsum()
    import pandas as pd

    pd.testing.assert_frame_equal(out, want, check_dtype=False, atol=1e-9)


def test_row_number_col():
    from tenzir_ray.ops.window import row_number_col

    n = 100
    rng = np.random.default_rng(4)
    t = pa.table(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 4, n),
        }
    )
    out = (
        row_number_col(ray.data.from_arrow(t).repartition(5), "k", ["id"], out_col="rn")
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    want["rn"] = want.groupby("k").cumcount() + 1
    import pandas as pd

    pd.testing.assert_frame_equal(out, want, check_dtype=False)
