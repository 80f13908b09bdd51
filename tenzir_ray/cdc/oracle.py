"""Single-pass DuckDB oracle materialization of a binlog.

The correctness gate (BASELINE.json): after full replay, the lake must
equal this single-pass materialization row-for-row, verified per row by
``sha256(content)`` equality. Mirrors the reference's golden-output
test style (``tenzir/integration/integration.py`` diffing against
checked-in references) with a computed oracle instead of checked-in
files.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa

# the enricher's ext->lang rules, expressed in SQL (must match
# tenzir_ray.cdc.engine.EXT_TO_LANG)
_LANG_CASE = """
    CASE regexp_extract(path, '\\.(\\w+)$', 1)
        WHEN 'py' THEN 'py' WHEN 'rs' THEN 'rs' WHEN 'cc' THEN 'cpp'
        WHEN 'go' THEN 'go' WHEN 'js' THEN 'js' WHEN 'md' THEN 'md'
        WHEN 'yml' THEN 'yaml' ELSE NULL
    END
"""


def materialize(binlog_dir: str, evolved: bool = False) -> pa.Table:
    """LWW materialization: per (repo, path) the max-commit_seq event,
    tombstones dropped, lang enriched, sha256 stamped."""
    extra = ", branch, size_bytes" if evolved else ""
    sql = f"""
    SELECT repo, path, commit, coalesce(lang, {_LANG_CASE}) AS lang,
           content, commit_seq, sha256(content) AS content_sha256{extra}
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY repo, path ORDER BY commit_seq DESC, "offset" DESC
        ) AS rn
        FROM read_parquet('{binlog_dir}/part-*.parquet', union_by_name=true)
    )
    WHERE rn = 1 AND op <> 'delete'
    ORDER BY repo, path
    """
    return duckdb.sql(sql).arrow()


def compare_states(lake_table: pa.Table, oracle_table: pa.Table) -> dict:
    """Row-for-row comparison keyed on (repo, path): row counts, the
    per-row sha256 parity invariant, and full-column equality."""
    lt = lake_table.sort_by([("repo", "ascending"), ("path", "ascending")])
    ot = oracle_table.sort_by([("repo", "ascending"), ("path", "ascending")])
    result = {"lake_rows": lt.num_rows, "oracle_rows": ot.num_rows, "mismatches": []}
    if lt.num_rows != ot.num_rows:
        lk = set(zip(lt["repo"].to_pylist(), lt["path"].to_pylist()))
        ok = set(zip(ot["repo"].to_pylist(), ot["path"].to_pylist()))
        result["mismatches"].append(
            {"missing_in_lake": sorted(ok - lk)[:5], "extra_in_lake": sorted(lk - ok)[:5]}
        )
        result["ok"] = False
        return result
    for col in ot.column_names:
        if col not in lt.column_names:
            result["mismatches"].append({"missing_column": col})
            continue
        a, b = lt[col].to_pylist(), ot[col].to_pylist()
        bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if bad:
            i = bad[0]
            result["mismatches"].append(
                {
                    "column": col,
                    "bad_rows": len(bad),
                    "first": {
                        "repo": lt["repo"][i].as_py(),
                        "path": lt["path"][i].as_py(),
                        "lake": a[i] if not isinstance(a[i], str) or len(a[i]) < 80 else a[i][:80],
                        "oracle": b[i] if not isinstance(b[i], str) or len(b[i]) < 80 else b[i][:80],
                    },
                }
            )
    result["ok"] = not result["mismatches"]
    return result
