"""Multi-host continuous batching.

The north star (BASELINE.json) asks for continuous batching *scheduled
across hosts*. The TPU-native shape of that: model replicas are data
parallel — each host (or chip group) runs its own ``ServingEngine`` over
its own paged cache, and a host-side scheduler routes requests. Nothing
about the per-engine hot loop changes, which is exactly why the design
scales: admission is the only cross-host decision, and it is O(requests),
not O(tokens).

``MultiHostScheduler`` implements the routing policy:

- least-loaded routing by outstanding work (prompt + max_new_tokens),
  falling back to round-robin on ties — keeps per-step batch occupancy
  even so the fixed-shape decode step stays full everywhere;
- per-engine backpressure is inherited from ``ServingEngine`` (page-pool
  exhaustion defers admission, OOM mid-flight evicts and requeues).

On a real pod each engine lives in its own host process and the scheduler
is a thin RPC front; here the engines run in-process, which exercises the
same scheduling logic (the engines are already independent JAX programs).
"""

from __future__ import annotations

import dataclasses

from flashattention_tpu.serving.engine import GenerationRequest, ServingEngine


@dataclasses.dataclass
class _EngineState:
    engine: ServingEngine
    outstanding: int = 0  # queued + in-flight token budget


class MultiHostScheduler:
    """Routes requests across N independent engines (one per host/replica)."""

    def __init__(self, engines: list[ServingEngine]):
        if not engines:
            raise ValueError("need at least one engine")
        self._states = [_EngineState(e) for e in engines]
        self._rr = 0
        self._cost: dict[int, tuple[int, int]] = {}  # rid -> (engine, cost)

    def submit(self, request: GenerationRequest) -> int:
        """Routes to the least-loaded engine; returns its index."""
        cost = len(request.prompt) + request.max_new_tokens
        best = min(
            range(len(self._states)),
            key=lambda i: (
                self._states[i].outstanding,
                (i - self._rr) % len(self._states),
            ),
        )
        self._rr = (best + 1) % len(self._states)
        self._states[best].outstanding += cost
        self._cost[request.request_id] = (best, cost)
        self._states[best].engine.submit(request)
        return best

    def step(self) -> None:
        """One tick on every engine (on a pod: one tick per host, issued in
        parallel — engines share no state)."""
        for st in self._states:
            st.engine.step()
        self._settle()

    def _settle(self) -> None:
        """Release load held by requests that have finished, so the
        least-loaded routing always sees current load (interleaved
        submit()/step() usage included)."""
        for rid, (idx, cost) in list(self._cost.items()):
            if rid in self._states[idx].engine.finished:
                self._states[idx].outstanding -= cost
                del self._cost[rid]

    def run(self, max_steps: int = 10_000) -> dict[int, list[int]]:
        """Drive all engines to completion; merged {request_id: tokens}."""
        def busy() -> bool:
            return any(
                st.engine.waiting or st.engine._num_active()
                for st in self._states
            )

        steps = 0
        while busy() and steps < max_steps:
            self.step()
            steps += 1
        self._settle()
        results: dict[int, list[int]] = {}
        for st in self._states:
            done = {
                rid: toks for rid, toks in st.engine.finished.items()
            }
            overlap = set(results) & set(done)
            if overlap:
                raise RuntimeError(f"duplicate request ids across hosts: {overlap}")
            results.update(done)
        return results

    @property
    def loads(self) -> list[int]:
        return [st.outstanding for st in self._states]
