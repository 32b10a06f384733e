"""tpu_jit: jax.jit with TPU compiler options applied.

XLA's default scoped-VMEM limit (16MB) rejects our fused pallas launches
when it stages the custom-call operands in VMEM inside the bounce scan
("Ran out of memory in memory space vmem ... scoped").  The fix is the
``xla_tpu_scoped_vmem_limit_kib`` compile option, which the jit decorator
can't set — so this wrapper lowers+compiles explicitly on TPU backends with
an aval-keyed cache, and degrades to plain ``jax.jit`` elsewhere.

Convention: static arguments MUST be passed as keyword arguments (the AOT
``Compiled`` object is called with dynamic arguments only).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax

TPU_COMPILER_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": os.environ.get(
        "RT_SCOPED_VMEM_KIB", "122880"
    ),
}

_TPU_BACKENDS = ("tpu", "axon")


def _keyify(x: Any):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return ("a", tuple(x.shape), str(x.dtype))
    return ("s", x)


def tpu_jit(fn=None, *, static_argnames=()):
    """Drop-in for ``jax.jit(fn, static_argnames=...)`` with TPU options."""
    if fn is None:
        return functools.partial(tpu_jit, static_argnames=static_argnames)
    if isinstance(static_argnames, str):
        static_argnames = (static_argnames,)

    jitted = jax.jit(fn, static_argnames=static_argnames)
    cache: Dict[Tuple, Any] = {}

    @functools.wraps(fn)
    def call(*args, **kwargs):
        if jax.default_backend() not in _TPU_BACKENDS:
            return jitted(*args, **kwargs)
        leaves, treedef = jax.tree.flatten((args, kwargs))
        try:
            key = (treedef, tuple(_keyify(l) for l in leaves))
            hash(key)
        except TypeError:
            return jitted(*args, **kwargs)  # unhashable: skip the AOT cache
        compiled = cache.get(key)
        if compiled is None:
            compiled = jitted.lower(*args, **kwargs).compile(
                compiler_options=dict(TPU_COMPILER_OPTIONS)
            )
            cache[key] = compiled
        dyn_kwargs = {k: v for k, v in kwargs.items() if k not in static_argnames}
        return compiled(*args, **dyn_kwargs)

    return call
