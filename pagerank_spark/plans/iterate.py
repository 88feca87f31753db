"""Generic BSP iterate-until-converged driver.

The engine's iterative graph algorithms (connected components, label
propagation, join-mode PageRank) share one loop skeleton: compute the
next state from the current one, truncate lineage with
``localCheckpoint`` so the physical plan stays O(1) across rounds, run
one cheap convergence action, stop at ``max_iter`` otherwise. This is
the Pregel superstep shape with Spark's execution model: state is a
DataFrame, a superstep is a handful of joins/aggregates Catalyst plans
whole, and the only driver-side work per round is the convergence
check.

``iterate`` extracts that skeleton once — CC/LPA/join-PR are expressed
on it, and users get the same extension point for new iterative
algorithms (shortest paths, k-core peeling, …) without hand-rolling
lineage truncation or stall warnings. The C reference hand-rolls the
equivalent do-while in every variant (``Page_Rank_SERIAL.c:206-279``);
here it exists exactly once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    converged: Callable[[DataFrame, DataFrame, int], bool],
    max_iter: int,
    checkpoint: bool = True,
    warn: str | None = None,
) -> tuple[DataFrame, int, bool]:
    """Run ``state = step(state, round)`` until ``converged`` or
    ``max_iter`` rounds; returns ``(state, rounds_run, converged)``.

    - ``step(state, round)`` (1-based round) returns the next state; it
      must NOT checkpoint — the harness localCheckpoints every round so
      plans never grow with the round count.
    - ``converged(prev, new, round)`` runs AFTER the checkpoint, so any
      action it triggers (count, agg) scans materialized partitions; it
      may carry loop state in a closure (e.g. CC's count-first /
      lazy-hash detection) and record per-round metrics.
    - do-while semantics: ``step`` always runs at least once when
      ``max_iter >= 1``.
    - ``warn``: message to emit as a RuntimeWarning when ``max_iter``
      is exhausted without convergence (omit for fixed-round
      algorithms where running out IS the contract, e.g. LPA gates).
    """
    done = False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        new = step(state, rounds)
        if checkpoint:
            new = new.localCheckpoint()
        if converged(state, new, rounds):
            state = new
            done = True
            break
        state = new
    if not done and warn is not None:
        import warnings

        warnings.warn(warn, RuntimeWarning, stacklevel=2)
    return state, rounds, done
