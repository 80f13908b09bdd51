"""Plugin registry + `show` introspection.

The reference's extension surface is its plugin taxonomy
(``include/tenzir/plugin.hpp``: operator/parser/printer/loader/saver/
aggregation-function plugins registered via ``TENZIR_REGISTER_PLUGIN``)
and the `show <aspect>` operator that enumerates them
(``builtins/operators/show.cpp:32-90``, aspects in
``builtins/aspects/*.cpp``).

Here: plain dict registries + ``register_*`` decorators. The TQL
compiler and `show` read from them, so a user package can add an
operator with three lines::

    from tenzir_ray import registry

    @registry.register_operator("double")
    def double(ds, rest):          # rest = raw arg string from TQL
        return ds.map_batches(...)
"""

from __future__ import annotations

from typing import Callable, Dict

import tenzir_ray

OPERATORS: Dict[str, Callable] = {}
PARSERS: Dict[str, Callable] = {}
AGGREGATES: Dict[str, str] = {}


def register_operator(name: str):
    def deco(fn):
        OPERATORS[name] = fn
        return fn

    return deco


def register_parser(name: str):
    def deco(fn):
        PARSERS[name] = fn
        return fn

    return deco


def _builtin_inventory() -> Dict[str, list]:
    from tenzir_ray.ops import AGGREGATE_FUNCTIONS

    return {
        "operators": sorted(
            [
                "where", "select", "drop", "rename", "put", "extend", "replace",
                "hash", "flatten", "unflatten", "head", "tail", "taste", "unique",
                "enumerate", "batch", "repeat", "measure", "pass", "discard",
                "summarize", "sort", "top", "rare", "sigma", "pseudonymize",
                "compress", "decompress", "serve", "decapsulate", "shell",
                "sessionize", "tumbling", "hopping",
                "dedup-exact", "dedup-minhash", "dedup-ngram", "dedup-simhash", "dedup-embedding",
                "asof-join", "range-join", "lookup-join", "shuffle-join", "lww", "explode",
                "decontaminate", "repetition", "redact", "sample", "pack", "lag",
            ]
            + sorted(OPERATORS)
        ),
        "aggregation_functions": list(AGGREGATE_FUNCTIONS),
        "formats": ["parquet", "csv", "json", "lines", "binary", "cef", "zeek-tsv", "yaml", "kv", "pcap"]
        + sorted(PARSERS),
        "connectors": [
            "file", "s3 (arrow fs)", "gcs (arrow fs)", "http(s) (read_http)",
            "stdin (-)", "stream source (StreamSource protocol)",
        ],
        "pipelines": ["cdc replay (binlog -> lww merge -> lake)", "compaction/rebucket"],
        "training_data_ops": [
            "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
            "dedup_embedding", "knn_brute", "knn_ivf", "lang_id", "quality_score",
            "token_count", "bpe_token_count", "fingerprint", "decode_images",
            "resize_images", "audio_features", "decontaminate", "repetition_stats",
            "stratified_sample", "sample_fraction", "weighted_sample", "redact",
            "pack_sequences", "curate",
        ],
        "version": [tenzir_ray.__version__],
    }


def show(aspect: str = "operators") -> "ray.data.Dataset":  # noqa: F821
    """`show <aspect>` (reference: ``builtins/operators/show.cpp``):
    a Dataset of {aspect, name} rows. Aspects: operators,
    aggregation_functions, formats, connectors, pipelines,
    training_data_ops, version."""
    import ray.data

    inv = _builtin_inventory()
    if aspect not in inv:
        raise ValueError(f"unknown aspect {aspect!r}; one of {sorted(inv)}")
    return ray.data.from_items([{"aspect": aspect, "name": n} for n in inv[aspect]])
