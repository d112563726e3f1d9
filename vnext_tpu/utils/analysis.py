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
