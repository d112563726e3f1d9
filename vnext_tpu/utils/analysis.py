"""Model analysis: FLOPs / parameter counting (reference surface:
detectron2/utils/analysis.py:55-158, tools/analyze_model.py).

On JAX, FLOP counting comes from XLA's own cost analysis of the compiled
executable — more accurate than the reference's operator-table estimates."""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import numpy as np


def parameter_count(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def parameter_count_table(params: Any, max_depth: int = 2) -> str:
    """Hierarchical parameter counts, like the reference's parameter_count_table."""
    rows: Dict[str, int] = {}

    def visit(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(v, prefix + (k,))
        else:
            n = int(np.prod(tree.shape))
            for d in range(1, max_depth + 1):
                key = ".".join(prefix[:d])
                rows[key] = rows.get(key, 0) + n
            rows[""] = rows.get("", 0) + n

    visit(params, ())
    lines = [f"{'module':50s} #params"]
    for key in sorted(rows):
        name = key if key else "(total)"
        lines.append(f"{name:50s} {rows[key] / 1e6:8.2f}M")
    return "\n".join(lines)


def flop_count(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs and bytes accessed of the jitted fn at the example shapes."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes accessed": float(cost.get("bytes accessed", float("nan"))),
    }


_ACTIVATION_PRIMS = ("conv_general_dilated", "dot_general")


def activation_count(fn: Callable, *example_args) -> int:
    """Total activations (elements output by conv / matmul ops) of ``fn`` at
    the example shapes.

    Semantics match the reference's ActivationCountAnalysis
    (detectron2/utils/analysis.py:103, fvcore): activations = sum of output
    element counts over convolution and fully-connected (dot) operations.
    Counted on the traced jaxpr, recursing through sub-jaxprs; bodies of
    ``lax.scan`` are multiplied by the trip count (one trace, ``length``
    executions)."""

    jaxpr = jax.make_jaxpr(fn)(*example_args)

    def count(jx, mult) -> int:
        total = 0
        for eqn in jx.eqns:
            if eqn.primitive.name in _ACTIVATION_PRIMS:
                for ov in eqn.outvars:
                    shape = getattr(ov.aval, "shape", ())
                    total += mult * int(np.prod(shape)) if shape else mult
            sub_mult = mult
            if eqn.primitive.name == "scan":
                sub_mult = mult * int(eqn.params.get("length", 1))
            for p in eqn.params.values():
                for sub in _subjaxprs(p):
                    total += count(sub, sub_mult)
        return total

    return count(jaxpr.jaxpr, 1)


def _subjaxprs(param):
    from jax.extend import core as jex_core

    if isinstance(param, jex_core.ClosedJaxpr):
        yield param.jaxpr
    elif isinstance(param, jex_core.Jaxpr):
        yield param
    elif isinstance(param, (tuple, list)):
        for item in param:
            yield from _subjaxprs(item)


def find_unused_parameters(loss_fn: Callable, params: Any, *args,
                           seed: int = 0) -> Sequence[str]:
    """Names of parameter leaves that receive no gradient from ``loss_fn``
    (reference surface: detectron2/utils/analysis.py:158
    find_unused_parameters — there via autograd hooks, here via grads that
    are exactly zero at a random evaluation point; a used parameter having an
    identically-zero gradient at random inputs is measure-zero, but relu-dead
    branches can false-positive — treat the output as a lint, not a proof)."""
    import jax.numpy as jnp

    grads = jax.grad(lambda p: jnp.sum(
        sum(jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(loss_fn(p, *args)))
    ))(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    unused = []
    for path, leaf in flat:
        if not bool(jnp.any(leaf != 0)):
            unused.append(jax.tree_util.keystr(path))
    return unused
