"""Operator library: ``Dataset -> Dataset`` combinators.

Each operator mirrors a reference operator's semantics (cited per
function) but is implemented Ray-Data-first: vectorized Arrow kernels
inside ``map_batches``, Ray-native ``groupby``/``sort``/``limit`` for
the wide steps. Pipelines compose as plain function application —
the analog of the reference's "pipelines are operators"
(``libtenzir/include/tenzir/pipeline.hpp:401-542``).
"""

from tenzir_ray.ops.transform import (  # noqa: F401
    batch_op,
    discard,
    drop,
    enumerate_op,
    explode,
    extend,
    flatten,
    hash_op,
    head,
    measure,
    pass_op,
    pivot,
    put,
    rename,
    repeat,
    replace,
    select,
    tail,
    taste,
    unflatten,
    unique,
    unpivot,
    where,
)
from tenzir_ray.ops.summarize import AGGREGATE_FUNCTIONS, lww_latest, summarize  # noqa: F401
from tenzir_ray.ops.sort import rare, sort, top  # noqa: F401
