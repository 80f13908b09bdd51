"""A TQL-flavored pipeline mini-language over the operator library.

The reference's pipelines are ``op₁ | op₂ | ...`` strings parsed into
operator chains (``libtenzir/src/tql``, ``pipeline.hpp:416-424``).
This module gives users the same surface over Ray Data: a pipeline
string compiles to a ``Dataset -> Dataset`` function composed from
:mod:`tenzir_ray.ops`.

    from tenzir_ray import tql
    out = tql.run('where x > 2 | extend y = x * 10 | summarize n=count(.) by g | sort n desc', ds)

Supported operators: where select drop rename put extend replace head
tail taste unique enumerate sort top rare summarize hash flatten
unflatten batch repeat measure pass shell decapsulate sigma
lookup-join shuffle-join asof-join range-join sessionize tumbling hopping
dedup-exact dedup-minhash dedup-ngram dedup-simhash dedup-embedding;
nested pipelines via ``fork { ... }`` and ``if <pred> { ... } else
{ ... }`` (pipeline-as-operator, ``pipeline.hpp:401-542``).
"""

from __future__ import annotations

import re
from typing import Callable, List

from ray.data import Dataset

from tenzir_ray import ops

# split on single '|' (not '||' which is boolean OR inside expressions)
_PIPE_RE = re.compile(r"(?<!\|)\|(?!\|)")


def _quote_state(ch: str, quote: str) -> str:
    """Fold one character into the current string-literal state
    (``""`` = outside; ``'"'``/``"'"`` = inside that quote)."""
    if quote:
        return "" if ch == quote else quote
    return ch if ch in "\"'" else ""


def _split_pipes(text: str) -> List[str]:
    """Top-level stage split: single ``|`` at brace depth 0 (nested
    sub-pipelines ``{ ... }`` keep their own pipes; ``||`` is boolean
    OR inside expressions). Braces and pipes inside quoted string
    literals are PAYLOAD, not structure — `where msg matches "^\\{"`
    must not unbalance the pipeline."""
    parts, buf, depth, quote = [], [], 0, ""
    for i, ch in enumerate(text):
        if not quote:
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth < 0:
                    raise ValueError("unbalanced '}' in pipeline")
            elif (
                ch == "|"
                and depth == 0
                and (i == 0 or text[i - 1] != "|")
                and (i + 1 >= len(text) or text[i + 1] != "|")
            ):
                parts.append("".join(buf))
                buf = []
                continue
        quote = _quote_state(ch, quote)
        buf.append(ch)
    if depth != 0:
        raise ValueError("unbalanced '{' in pipeline")
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _find_top_brace(text: str) -> int:
    """Index of the first '{' OUTSIDE string literals, or -1."""
    quote = ""
    for i, ch in enumerate(text):
        if not quote and ch == "{":
            return i
        quote = _quote_state(ch, quote)
    return -1


def _take_brace_block(text: str) -> tuple:
    """Parse ``{ <sub-pipeline> } <remainder>`` → (body, remainder).
    ``text`` must start (after whitespace) with '{'. Quote-aware like
    :func:`_split_pipes`."""
    text = text.lstrip()
    if not text.startswith("{"):
        raise ValueError(f"expected '{{ ... }}' sub-pipeline, got {text[:40]!r}")
    depth, quote = 0, ""
    for i, ch in enumerate(text):
        if not quote:
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    return text[1:i].strip(), text[i + 1 :].strip()
        quote = _quote_state(ch, quote)
    raise ValueError("unbalanced '{' in sub-pipeline")
# alias = func(args): func may be dotted (quantile_cont_0.95); args may
# be "." (row count), one column, or a comma list (arg_max payload+order)
_AGG_RE = re.compile(r"^\s*(\w+)\s*=\s*([\w.]+)\s*\(\s*([\w.,\s]*)\)\s*$")


def _split_commas(text: str) -> List[str]:
    """Top-level comma split (commas inside [...] or (...) don't split)."""
    parts, depth, buf = [], 0, []
    for ch in text:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _kv_pairs(text: str) -> dict:
    out = {}
    for part in _split_commas(text):
        name, expr = part.split("=", 1)
        out[name.strip()] = expr.strip()
    return out


def _compile_stage(stage: str) -> Callable[[Dataset], Dataset]:
    stage = stage.strip()
    if not stage:
        raise ValueError("empty pipeline stage")
    op, _, rest = stage.partition(" ")
    rest = rest.strip()

    # nested pipelines — pipeline-as-operator (``pipeline.hpp:401-542``,
    # ``builtins/operators/pipeline.cpp``): sub-pipelines compile
    # recursively at compile time, not at run time
    if op == "fork":
        # fork { <pipeline> } — run a sub-pipeline over a copy of the
        # stream for its side effects (sinks, serving); the input
        # passes through unchanged. Ray shape: the sub-DAG re-reads the
        # same lazy source and is driven to completion here.
        body, trailing = _take_brace_block(rest)
        if trailing:
            raise ValueError(f"fork: unexpected trailing {trailing!r}")
        sub = compile_pipeline(body)

        def _fork(ds, _sub=sub):
            _sub(ds).materialize()
            return ds

        return _fork
    if op == "if":
        # if <predicate> { <then> } [else { <else> }] — TRUE rows take
        # the then-branch; false AND null rows take the else-branch
        # (SQL/Kleene: only proven-true rows match). Branch outputs
        # union; branches must keep union-compatible schemas.
        brace = _find_top_brace(rest)
        if brace < 0:
            raise ValueError("if wants: <predicate> { <pipeline> } [else { <pipeline> }]")
        pred = rest[:brace].strip()
        then_body, trailing = _take_brace_block(rest[brace:])
        else_body = None
        if trailing:
            if not trailing.startswith("else"):
                raise ValueError(f"if: unexpected trailing {trailing!r}")
            else_body, trailing = _take_brace_block(trailing[len("else") :])
            if trailing:
                raise ValueError(f"if: unexpected trailing {trailing!r}")
        then_fn = compile_pipeline(then_body)
        else_fn = compile_pipeline(else_body) if else_body else (lambda ds: ds)

        def _if(ds, _pred=pred, _then=then_fn, _else=else_fn):
            import pyarrow.compute as pc

            from tenzir_ray.expr import compile_predicate

            mask_fn = compile_predicate(_pred)

            def keep_true(t):
                return t.filter(pc.fill_null(mask_fn(t), False))

            def keep_rest(t):
                return t.filter(pc.invert(pc.fill_null(mask_fn(t), False)))

            kw = dict(batch_format="pyarrow", zero_copy_batch=True)
            return _then(ds.map_batches(keep_true, **kw)).union(
                _else(ds.map_batches(keep_rest, **kw))
            )

        return _if

    if op == "where":
        return lambda ds: ops.where(ds, rest)
    if op == "select":
        cols = _split_commas(rest)
        return lambda ds: ops.select(ds, cols)
    if op == "drop":
        cols = _split_commas(rest)
        return lambda ds: ops.drop(ds, cols)
    if op == "rename":
        mapping = _kv_pairs(rest)
        return lambda ds: ops.rename(ds, mapping)
    if op in ("put", "extend", "replace"):
        fields = _kv_pairs(rest)
        fn = {"put": ops.put, "extend": ops.extend, "replace": ops.replace}[op]
        return lambda ds: fn(ds, fields)
    if op == "head":
        n = int(rest) if rest else 10
        return lambda ds: ops.head(ds, n)
    if op == "tail":
        n = int(rest) if rest else 10
        return lambda ds: ops.tail(ds, n)
    if op == "taste":
        parts = rest.split()
        by, n = parts[0], int(parts[1]) if len(parts) > 1 else 10
        return lambda ds: ops.taste(ds, by, n)
    if op == "unique":
        return lambda ds: ops.unique(ds)
    if op == "enumerate":
        field = rest or "#"
        return lambda ds: ops.enumerate_op(ds, field)
    if op == "sort":
        parts = rest.split()
        key = parts[0]
        desc = len(parts) > 1 and parts[1].lower() in ("desc", "descending")
        return lambda ds: ops.sort(ds, key, descending=desc)
    if op in ("top", "rare"):
        # top <field> [k] [--approx]
        parts = rest.split()
        approx = "--approx" in parts
        parts = [p for p in parts if p != "--approx"]
        field = parts[0]
        k = int(parts[1]) if len(parts) > 1 else None
        fn = ops.top if op == "top" else ops.rare
        return lambda ds: fn(ds, field, k=k, approx=approx)
    if op == "summarize":
        # summarize out=f(col), ... by k1, k2
        if " by " in rest:
            agg_part, by_part = rest.rsplit(" by ", 1)
            by = _split_commas(by_part)
        else:
            agg_part, by = rest, None
        aggs = {}
        for item in _split_commas(agg_part):
            m = _AGG_RE.match(item)
            if not m:
                raise ValueError(f"bad aggregate {item!r} (want name=func(col))")
            alias, func, arg = m.group(1), m.group(2), m.group(3).strip()
            cols = [c.strip() for c in arg.split(",") if c.strip()]
            if func in ("arg_max", "arg_min"):
                aggs[alias] = (func, cols)  # [payload, order1, ...]
            elif len(cols) > 1:
                raise ValueError(f"{func} takes one column, got {arg!r}")
            else:
                col = cols[0] if cols else None
                aggs[alias] = (func, None if col in (None, ".") else col)
        return lambda ds: ops.summarize(ds, aggs, by=by)
    if op == "hash":
        parts = rest.split()
        field = parts[0]
        salt = ""
        if "--salt" in parts:
            salt = parts[parts.index("--salt") + 1]
        return lambda ds: ops.hash_op(ds, field, salt=salt)
    if op == "flatten":
        sep = rest or "."
        return lambda ds: ops.flatten(ds, sep)
    if op == "unflatten":
        sep = rest or "."
        return lambda ds: ops.unflatten(ds, sep)
    if op == "batch":
        n = int(rest) if rest else 65536
        return lambda ds: ops.batch_op(ds, n)
    if op == "repeat":
        return lambda ds: ops.repeat(ds, int(rest))
    if op == "measure":
        return lambda ds: ops.measure(ds)
    if op == "pass":
        return lambda ds: ds
    if op == "shell":
        cmd = rest.strip().strip('"').strip("'")

        def _shell(ds, _cmd=cmd):
            from tenzir_ray.ops.shell import shell_op

            return shell_op(ds, _cmd)

        return _shell
    if op == "decapsulate":

        def _decap(ds):
            from tenzir_ray.pcap import decapsulate

            return decapsulate(ds)

        return _decap
    if op == "sigma":

        def _sigma(ds, _rule=rest.strip()):
            from tenzir_ray.sigma import sigma

            return sigma(ds, _rule)

        return _sigma
    if op == "sessionize":
        # sessionize <key> <ts> [gap] [--sorted]
        parts = rest.split()
        skey, sts = parts[0], parts[1]
        gap = next((p for p in parts[2:] if not p.startswith("--")), "30min")
        hot = "--sorted" in parts

        def _sess(ds, _k=skey, _t=sts, _g=gap, _hot=hot):
            from tenzir_ray.ops.window import sessionize, sessionize_sorted

            fn = sessionize_sorted if _hot else sessionize
            return fn(ds, _k, _t, gap=_g)

        return _sess
    if op == "tumbling":
        # tumbling <key> <ts> [width]
        parts = rest.split()

        def _tumb(ds, _k=parts[0], _t=parts[1], _w=parts[2] if len(parts) > 2 else "1h"):
            from tenzir_ray.ops.window import tumbling_count

            return tumbling_count(ds, _k, _t, width=_w)

        return _tumb
    if op == "hopping":
        # hopping <key> <ts> [width] [hop]
        parts = rest.split()

        def _hop(ds, _k=parts[0], _t=parts[1],
                 _w=parts[2] if len(parts) > 2 else "1h",
                 _h=parts[3] if len(parts) > 3 else "15min"):
            from tenzir_ray.ops.window import hopping_count

            return hopping_count(ds, _k, _t, width=_w, hop=_h)

        return _hop
    if op == "asof-join":
        # asof-join <parquet_path> on <ts> [by <key>] [--shuffle] [--forward]
        # tokenize — substring matching would hit inside longer tokens
        # (e.g. a path containing "--shuffled") and corrupt the path
        toks = rest.split()
        flags = {f for f in ("--shuffle", "--forward") if f in toks}
        rest = " ".join(t for t in toks if t not in flags)
        m = re.match(r"(\S+)\s+on\s+(\S+)(?:\s+by\s+(\S+))?$", rest)
        if not m:
            raise ValueError(
                "asof-join wants: <parquet> on <ts> [by <key>] [--shuffle] [--forward]"
            )
        direction = "forward" if "--forward" in flags else "backward"
        if direction == "forward" and "--shuffle" not in flags:
            raise ValueError("--forward requires --shuffle (the shuffle path)")

        def _aj(ds, _p=m.group(1), _on=m.group(2), _by=m.group(3),
                _sh="--shuffle" in flags, _dir=direction):
            if _sh:  # big-right path: the right side stays a Dataset
                import ray.data

                from tenzir_ray.ops.join import asof_shuffle_join

                return asof_shuffle_join(
                    ds, ray.data.read_parquet(_p), on=_on, by=_by, direction=_dir
                )
            import pyarrow.parquet as pq

            from tenzir_ray.ops.join import asof_join

            return asof_join(ds, pq.read_table(_p), on=_on, by=_by)

        return _aj
    if op == "lww":
        # lww <key[,key2...]> order <order1[,order2...]> — full-row
        # last-writer-wins per key (ops.lww_latest)
        m = re.match(r"(\S+)\s+order\s+(\S+)$", rest)
        if not m:
            raise ValueError("lww wants: <key[,key2]> order <col1[,col2]>")
        keys = m.group(1).split(",")
        orders = m.group(2).split(",")

        def _lww(ds, _k=keys, _o=orders):
            from tenzir_ray.ops.summarize import lww_latest

            return lww_latest(ds, _k, _o)

        return _lww
    if op in ("dedup-exact", "dedup-minhash", "dedup-ngram", "dedup-simhash", "dedup-embedding"):
        # dedup-* <value_col> <id_col> [--exchange]: --exchange forces
        # the beyond-broadcast verification path (minhash/ngram)
        parts = rest.split()
        exchange = "--exchange" in parts
        parts = [p for p in parts if p != "--exchange"]
        if len(parts) != 2:
            raise ValueError(f"{op} wants: <value_col> <id_col> [--exchange]")
        col, idc = parts
        vp = "exchange" if exchange else "auto"

        def _dd(ds, _op=op, _c=col, _i=idc, _vp=vp):
            from tenzir_ray import dedup as _d

            if _op == "dedup-exact":
                return _d.dedup_exact(ds, _c, _i)
            if _op == "dedup-minhash":
                return _d.dedup_minhash_lsh(ds, _c, _i, threshold=0.8, verify_path=_vp)
            if _op == "dedup-ngram":
                return _d.dedup_ngram_jaccard(ds, _c, _i, threshold=0.6, verify_path=_vp)
            if _op == "dedup-simhash":
                return _d.dedup_simhash(ds, _c, _i, max_hamming=2)
            return _d.dedup_embedding(ds, _c, _i, threshold=0.999)

        return _dd
    if op == "range-join":
        # range-join <parquet_path> on <left_col> in <lo_col>..<hi_col>
        #   [--shuffle] [how]   (--shuffle: big-big range-partitioned path,
        #   the interval side stays a Dataset — exact-token parse like
        #   asof-join's flags)
        m = re.match(r"(\S+)\s+on\s+(\S+)\s+in\s+(\S+)\.\.(\S+)(?:\s+(.+))?$", rest)
        if not m:
            raise ValueError(
                "range-join wants: <parquet> on <col> in <lo>..<hi> [--shuffle] [how]"
            )
        path, col, lo, hi, tail = m.groups()
        tokens = (tail or "").split()
        shuffle = "--shuffle" in tokens
        tokens = [t for t in tokens if t != "--shuffle"]
        how = " ".join(tokens) or "inner"

        def _rj(ds, _p=path, _c=col, _lo=lo, _hi=hi, _h=how, _sh=shuffle):
            if _sh:
                import ray.data

                from tenzir_ray.ops.join import range_shuffle_join

                return range_shuffle_join(
                    ds, ray.data.read_parquet(_p), on=_c, lo_col=_lo, hi_col=_hi, how=_h
                )
            import pyarrow.parquet as pq

            from tenzir_ray.ops.join import range_join

            return range_join(ds, pq.read_table(_p), on=_c, lo_col=_lo, hi_col=_hi, how=_h)

        return _rj
    if op == "shuffle-join":
        # shuffle-join <parquet_path> on <key>[=<right_key>] [how...]
        m = re.match(r"(\S+)\s+on\s+(\S+?)(?:=(\S+))?(?:\s+(.+))?$", rest)
        if not m:
            raise ValueError("shuffle-join wants: <parquet> on <key>[=<right_key>] [how]")
        path, key, rkey, how = m.group(1), m.group(2), m.group(3), m.group(4) or "inner"

        def _sj(ds, _p=path, _k=key, _rk=rkey, _h=how):
            import ray.data

            from tenzir_ray.ops.join import shuffle_join

            return shuffle_join(ds, ray.data.read_parquet(_p), keys=_k,
                                right_keys=_rk or _k, how=_h)

        return _sj
    if op == "lookup-join":
        # lookup-join <parquet_path> on <key>[=<right_key>]
        m = re.match(r"(\S+)\s+on\s+(\S+?)(?:=(\S+))?$", rest)
        if not m:
            raise ValueError("lookup-join wants: <parquet> on <key>[=<right_key>]")
        path, key, rkey = m.group(1), m.group(2), m.group(3)

        def _lj(ds, _p=path, _k=key, _rk=rkey):
            import pyarrow.parquet as pq

            from tenzir_ray.ops.join import lookup_join

            return lookup_join(ds, pq.read_table(_p), keys=_k, right_keys=_rk or _k)

        return _lj
    if op == "decontaminate":
        # decontaminate <bench_parquet> [text_col] [n] — flag rows whose
        # word n-grams overlap the benchmark set (broadcast, no shuffle)
        parts = rest.split()
        if not 1 <= len(parts) <= 3:
            raise ValueError("decontaminate wants: <bench_parquet> [text_col] [n]")
        path = parts[0]
        tcol = parts[1] if len(parts) > 1 else "text"
        n = int(parts[2]) if len(parts) > 2 else 3

        def _dc(ds, _p=path, _c=tcol, _n=n):
            import ray.data

            from tenzir_ray.curation import decontaminate

            return decontaminate(ds, ray.data.read_parquet(_p), text_col=_c, n=_n)

        return _dc
    if op == "explode":
        # explode <list_col> [pos_col] — unnest a list column to rows
        parts = rest.split()
        if not 1 <= len(parts) <= 2:
            raise ValueError("explode wants: <list_col> [pos_col]")

        def _ex(ds, _c=parts[0], _p=parts[1] if len(parts) > 1 else None):
            from tenzir_ray.ops.transform import explode

            return explode(ds, _c, pos_col=_p)

        return _ex
    if op == "lag":
        # lag <col> by <key> order <col1[,col2]> — per-key LAG window
        m = re.match(r"(\S+)\s+by\s+(\S+)\s+order\s+(\S+)$", rest)
        if not m:
            raise ValueError("lag wants: <col> by <key> order <col1[,col2]>")

        def _lag(ds, _c=m.group(1), _k=m.group(2), _o=m.group(3).split(",")):
            from tenzir_ray.ops.window import lag_col

            return lag_col(ds, _c, _k, _o)

        return _lag
    if op == "pack":
        # pack <token_col> <budget> by <order_col> — sequence packing
        m = re.match(r"(\S+)\s+(\d+)\s+by\s+(\S+)$", rest)
        if not m:
            raise ValueError("pack wants: <token_col> <budget> by <order_col>")

        def _pk(ds, _t=m.group(1), _b=int(m.group(2)), _o=m.group(3)):
            from tenzir_ray.curation import pack_sequences

            return pack_sequences(ds, _t, budget=_b, order_col=_o)

        return _pk
    if op == "redact":
        # redact <col[,col2...]> — PII scrub (emails/IPs/phones)
        cols = _split_commas(rest) if rest.strip() else None
        if not cols:
            raise ValueError("redact wants: <col[,col2...]>")

        def _red(ds, _c=cols):
            from tenzir_ray.text import redact

            return redact(ds, _c)

        return _red
    if op == "repetition":
        # repetition [text_col] — per-document repetition signals
        tcol = rest.strip() or "text"

        def _rep(ds, _c=tcol):
            from tenzir_ray.curation import repetition_stats

            return repetition_stats(ds, _c)

        return _rep
    if op == "sample":
        # sample <frac> <id_col> — deterministic fractional sample, or
        # sample <k> per <strata_col> by <id_col> — stratified top-k
        m = re.match(r"(\d+)\s+per\s+(\S+)\s+by\s+(\S+)$", rest)
        if m:
            k, strata, idc = int(m.group(1)), m.group(2), m.group(3)

            def _ss(ds, _s=strata, _i=idc, _k=k):
                from tenzir_ray.curation import stratified_sample

                return stratified_sample(ds, _s, _i, _k)

            return _ss
        parts = rest.split()
        if len(parts) != 2:
            raise ValueError(
                "sample wants: <frac> <id_col> | <k> per <strata_col> by <id_col>"
            )
        frac, idc = float(parts[0]), parts[1]

        def _sf(ds, _i=idc, _f=frac):
            from tenzir_ray.curation import sample_fraction

            return sample_fraction(ds, _i, _f)

        return _sf
    # user-registered operators (registry.register_operator) get the raw
    # argument string — the operator_parser_plugin analog
    from tenzir_ray import registry

    if op in registry.OPERATORS:
        fn = registry.OPERATORS[op]
        return lambda ds: fn(ds, rest)
    raise ValueError(f"unknown operator {op!r}")


def compile_pipeline(pipeline: str) -> Callable[[Dataset], Dataset]:
    """Compile ``op | op | ...`` into one Dataset transform (pipelines
    are operators — ``pipeline.hpp:401-542``); ``fork { ... }`` /
    ``if <pred> { ... } else { ... }`` nest sub-pipelines."""
    stages = [_compile_stage(s) for s in _split_pipes(pipeline)]

    def apply(ds: Dataset) -> Dataset:
        for stage in stages:
            ds = stage(ds)
        return ds

    return apply


def run(pipeline: str, ds: Dataset) -> Dataset:
    return compile_pipeline(pipeline)(ds)
