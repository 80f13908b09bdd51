"""Sigma-style detection rules as a stateful actor-pool stage.

The reference's `sigma` operator loads Sigma YAML rules, compiles each
to an expression, hot-reloads the rule files every refresh interval,
and emits matching events tagged with the rule
(``plugins/sigma/src/plugin.cpp:36-195``: monitor_state/update
:44-100; compiler ``plugins/sigma/src/parse.cpp``).

Here the same shape on Ray Data: :class:`SigmaMatcher` is a callable
class for ``map_batches(Cls, concurrency=N)`` — rules are loaded and
compiled ONCE per actor in ``__init__``, re-checked against file
mtimes every ``refresh_interval`` seconds (hot reload), and each batch
is evaluated with the vectorized expression engine
(:mod:`tenzir_ray.expr`). Matching events are emitted tagged with
``rule_title``.

Rule format (a pragmatic Sigma subset)::

    title: Suspicious purchase
    detection:
      selection:
        event_type: purchase      # equality (list -> IN)
        value|gt: 100             # gt/gte/lt/lte/contains/startswith
      filter:
        user_id: [1, 2]
      condition: selection and not filter
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import yaml
from ray.data import Dataset

from tenzir_ray import expr as ex

_MODS = {
    "gt": ">",
    "gte": ">=",
    "lt": "<",
    "lte": "<=",
}


def _field_predicate(field_spec: str, value) -> ex.Node:
    if "|" in field_spec:
        field, mod = field_spec.split("|", 1)
    else:
        field, mod = field_spec, None
    f = ex.Field(tuple(field.split(".")))
    if mod in _MODS:
        return ex.Cmp(_MODS[mod], f, ex.Literal(value))
    if mod in ("contains", "startswith", "endswith"):
        # handled at eval time with arrow string kernels
        return _StringMatch(f, mod, str(value))
    if isinstance(value, list):
        return ex.Cmp("in", f, ex.Literal(value))
    return ex.Cmp("==", f, ex.Literal(value))


class _StringMatch:
    """contains/startswith/endswith predicate node evaluated with
    vectorized Arrow string kernels."""

    def __init__(self, field: ex.Field, mode: str, needle: str):
        self.field, self.mode, self.needle = field, mode, needle

    def mask(self, table: pa.Table):
        col = table[".".join(self.field.path)]
        fn = {
            "contains": pc.match_substring,
            "startswith": pc.starts_with,
            "endswith": pc.ends_with,
        }[self.mode]
        return pc.fill_null(fn(col, self.needle), False)


def compile_rule(rule: Dict):
    """Compile one parsed rule into ``table -> boolean mask``."""
    detection = rule.get("detection", {})
    condition = detection.get("condition", "selection")
    groups = {}
    for name, spec in detection.items():
        if name == "condition":
            continue
        preds = [_field_predicate(f, v) for f, v in spec.items()]
        groups[name] = preds

    def group_mask(name: str, table: pa.Table):
        masks = []
        for p in groups[name]:
            if isinstance(p, _StringMatch):
                masks.append(p.mask(table))
            else:
                masks.append(pc.fill_null(ex.compile_predicate(p)(table), False))
        out = masks[0]
        for m in masks[1:]:
            out = pc.and_(out, m)
        return out

    tokens = condition.split()

    def evaluate(table: pa.Table):
        # tiny condition grammar: [not] name (and|or [not] name)*
        result = None
        op = "and"
        negate = False
        for tok in tokens:
            if tok == "and" or tok == "or":
                op = tok
            elif tok == "not":
                negate = True
            else:
                m = group_mask(tok, table)
                if negate:
                    m = pc.invert(m)
                    negate = False
                if result is None:
                    result = m
                elif op == "and":
                    result = pc.and_(result, m)
                else:
                    result = pc.or_(result, m)
        return result if result is not None else pa.array([False] * table.num_rows)

    return evaluate


def load_rules(path: str) -> List[Dict]:
    """Load one YAML file or every ``*.yml``/``*.yaml`` in a directory."""
    files = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith((".yml", ".yaml")):
                files.append(os.path.join(path, name))
    else:
        files = [path]
    rules = []
    for f in files:
        with open(f) as fh:
            for doc in yaml.safe_load_all(fh):
                if isinstance(doc, dict) and "detection" in doc:
                    rules.append(doc)
    return rules


class SigmaMatcher:
    """Actor-pool stage: compiled rule set per actor, hot reload on
    mtime change every ``refresh_interval`` seconds (the reference
    re-checks rule files on an interval,
    ``plugins/sigma/src/plugin.cpp:44-100``)."""

    def __init__(self, rule_path: str, refresh_interval: float = 30.0):
        self.rule_path = rule_path
        self.refresh_interval = refresh_interval
        self._last_check = 0.0
        self._mtime = -1.0
        self._compiled = []
        self._maybe_reload(force=True)

    def _path_mtime(self) -> float:
        if os.path.isdir(self.rule_path):
            times = [
                os.path.getmtime(os.path.join(self.rule_path, n))
                for n in os.listdir(self.rule_path)
                if n.endswith((".yml", ".yaml"))
            ]
            return max(times, default=0.0)
        return os.path.getmtime(self.rule_path)

    def _maybe_reload(self, force: bool = False) -> None:
        now = time.monotonic()
        if not force and now - self._last_check < self.refresh_interval:
            return
        self._last_check = now
        mtime = self._path_mtime()
        if mtime != self._mtime:
            self._mtime = mtime
            rules = load_rules(self.rule_path)
            self._compiled = [(r.get("title", f"rule-{i}"), compile_rule(r)) for i, r in enumerate(rules)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._maybe_reload()
        parts = []
        for title, evaluate in self._compiled:
            mask = evaluate(batch)
            hits = batch.filter(mask)
            if hits.num_rows:
                parts.append(hits.append_column("rule_title", pa.array([title] * hits.num_rows)))
        if not parts:
            empty = batch.slice(0, 0)
            return empty.append_column("rule_title", pa.array([], type=pa.string()))
        return pa.concat_tables(parts)


def sigma(ds: Dataset, rule_path: str, refresh_interval: float = 30.0, concurrency: int = 2) -> Dataset:
    """Emit events matching any rule, tagged with ``rule_title``."""
    return ds.map_batches(
        SigmaMatcher,
        fn_constructor_kwargs={"rule_path": rule_path, "refresh_interval": refresh_interval},
        concurrency=concurrency,
        num_cpus=0.5,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
