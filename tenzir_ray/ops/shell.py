"""`shell` operator — pipe bytes through a child process.

Reference: ``builtins/operators/shell.cpp:151-280`` — a source mode
(child stdout → byte chunks) and a transform mode (input chunks →
child stdin, child stdout → output chunks), with a reader thread to
avoid pipe deadlock.

Ray-Data shape: the transform runs as an ACTOR-POOL ``map_batches``
stage — one child process per batch, fed via ``communicate()`` (write
all / close stdin / read all: deadlock-free without a reader thread).
Where the reference streams the WHOLE pipeline through a single child,
this runs one child per block in parallel, which is semantically equal
for record-wise commands (tr/sed/grep/awk -style filters) and is the
scalable decomposition; commands needing global stream state must use
a single-block input (``repartition(1)``), documented here rather than
silently serialized.
"""

from __future__ import annotations

import subprocess
from typing import Optional

import pyarrow as pa
from ray.data import Dataset

_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


class _ShellRunner:
    """Actor: argv split once per actor; one child per batch."""

    def __init__(self, command: str, text_col: str, allow_failure: bool):
        import shlex

        self.argv = ["/bin/sh", "-c", command]
        del shlex  # command is a shell line, as in the reference
        self.text_col = text_col
        self.allow_failure = allow_failure

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = "\n".join(
            v for v in t[self.text_col].to_pylist() if v is not None
        )
        if payload:
            payload += "\n"
        proc = subprocess.run(
            self.argv, input=payload.encode(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        # grep-style commands exit 1 on "no matches" — only >1 is an error
        if proc.returncode > 1 and not self.allow_failure:
            raise RuntimeError(
                f"shell command failed ({proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[:500]}"
            )
        lines = proc.stdout.decode(errors="replace").splitlines()
        return pa.table({self.text_col: pa.array(lines, type=pa.string())})


def shell_op(
    ds: Dataset,
    command: str,
    text_col: str = "text",
    concurrency: int = 2,
    allow_failure: bool = False,
) -> Dataset:
    """Transform mode: each block's ``text_col`` lines pipe through
    ``command``; stdout lines are the new rows."""
    return ds.map_batches(
        _ShellRunner,
        fn_constructor_kwargs={
            "command": command, "text_col": text_col, "allow_failure": allow_failure,
        },
        concurrency=concurrency,
        num_cpus=0.5,
        **_PYARROW,
    )


def shell_source(command: str, text_col: str = "text") -> Dataset:
    """Source mode: run ``command`` once (in a Ray task, not on the
    driver) and emit its stdout lines as rows."""
    import ray
    import ray.data

    @ray.remote(num_cpus=0.5)
    def run() -> pa.Table:
        proc = subprocess.run(
            ["/bin/sh", "-c", command], stdout=subprocess.PIPE, stderr=subprocess.PIPE
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"shell command failed ({proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[:500]}"
            )
        lines = proc.stdout.decode(errors="replace").splitlines()
        return pa.table({text_col: pa.array(lines, type=pa.string())})

    return ray.data.from_arrow_refs([run.remote()])


def shell_bytes(
    ds: Dataset,
    command: str,
    data_col: str = "content",
    concurrency: int = 2,
    allow_failure: bool = False,
) -> Dataset:
    """Binary transform: each row's byte payload pipes through its own
    child (one exec per row — for per-document converters like
    decompressors or format shifters over a binary column). A failing
    child (missing binary, bad flags) raises with its stderr; with
    ``allow_failure=True`` the row becomes null instead — mirroring
    :class:`_ShellRunner`'s error handling."""

    class Runner:
        def __init__(self):
            self.argv = ["/bin/sh", "-c", command]

        def __call__(self, t: pa.Table) -> pa.Table:
            out = []
            for blob in t[data_col].to_pylist():
                if blob is None:
                    out.append(None)
                    continue
                proc = subprocess.run(
                    self.argv, input=bytes(blob), stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                )
                if proc.returncode != 0:
                    if allow_failure:
                        out.append(None)
                        continue
                    raise RuntimeError(
                        f"shell command failed ({proc.returncode}): "
                        f"{proc.stderr.decode(errors='replace')[:500]}"
                    )
                out.append(proc.stdout)
            i = t.column_names.index(data_col)
            return t.set_column(i, data_col, pa.array(out, type=pa.binary()))

    return ds.map_batches(
        Runner, concurrency=concurrency, num_cpus=0.5, batch_format="pyarrow",
        batch_size=64,
    )
