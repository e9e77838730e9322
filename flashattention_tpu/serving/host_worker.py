"""Process-separated multi-host serving (VERDICT r1 item 10).

``serving/multihost.py`` routes requests across N engines; on a real pod
each engine lives on its own host. This module supplies that process
isolation locally: each ``ProcessEngine`` spawns an OS process with its OWN
JAX runtime (``multiprocessing`` spawn context — no shared interpreter, no
shared XLA client, no forked runtime state) running a ``ServingEngine``
command loop over a pipe. The scheduler talks to it through the same
surface it uses in-process (``submit`` / ``step`` / ``finished`` /
``waiting`` / ``_num_active``), so ``MultiHostScheduler`` drives either
kind unchanged — the routing logic is validated under real process
isolation, and ``run_async``/``wait_run`` let all hosts decode in parallel
for weak-scaling measurements (scripts/serving_multihost_demo.py).

Weights are reconstructed in the worker from (config, seed) instead of
pickling the pytree — the multi-host story on a pod, where every host
initializes or restores its own replica.

The reference has no serving layer; this is BASELINE.json scope
("continuous batching scheduled across hosts").
"""

from __future__ import annotations

import multiprocessing as mp
import os
from dataclasses import asdict
from typing import Any


def _worker_main(conn, cfg_kwargs, ecfg_kwargs, param_seed, platform,
                 draft_cfg_kwargs=None, draft_seed=1):
    """Engine host process: build the replica, serve pipe commands."""
    import jax

    if platform:
        # Must be jax.config (env vars are pinned by sitecustomize).
        jax.config.update("jax_platforms", platform)

    from flashattention_tpu.models.transformer import (
        TransformerConfig,
        init_transformer,
    )
    from flashattention_tpu.serving.engine import (
        EngineConfig,
        GenerationRequest,
        ServingEngine,
    )

    cfg = TransformerConfig(**cfg_kwargs)
    ecfg = EngineConfig(**ecfg_kwargs)
    params = init_transformer(jax.random.key(param_seed), cfg)
    spec_kw = {}
    if draft_cfg_kwargs is not None:
        # Speculative replica: each worker owns its draft weights too
        # (same seed across replicas -> identical drafts -> routing parity
        # holds under greedy spec decoding).
        draft_cfg = TransformerConfig(**draft_cfg_kwargs)
        spec_kw = dict(
            draft_params=init_transformer(jax.random.key(draft_seed),
                                          draft_cfg),
            draft_cfg=draft_cfg,
        )
    engine = ServingEngine(params, cfg, ecfg, **spec_kw)

    while True:
        try:
            op, payload = conn.recv()
        except EOFError:
            break
        try:
            if op == "submit":
                rid, prompt, mnt = payload
                engine.submit(GenerationRequest(rid, list(prompt), mnt))
                conn.send(("ok", None))
            elif op == "step":
                engine.step()
                conn.send(("ok", None))
            elif op == "status":
                conn.send((
                    "ok",
                    (
                        len(engine.waiting),
                        engine._num_active(),
                        {k: list(v) for k, v in engine.finished.items()},
                    ),
                ))
            elif op == "run":
                conn.send(("ok", engine.run(payload)))
            elif op == "shutdown":
                conn.send(("ok", None))
                break
            else:
                conn.send(("err", f"unknown op {op!r}"))
        except Exception as e:  # surface worker faults to the scheduler
            conn.send(("err", f"{type(e).__name__}: {e}"))
    conn.close()


class ProcessEngine:
    """Pipe-RPC proxy exposing the ServingEngine surface the scheduler uses.

    The worker owns the weights and the paged cache; this object owns only
    the pipe. Compatible with ``MultiHostScheduler`` (same attributes), plus
    ``run_async``/``wait_run`` so multiple hosts decode concurrently.
    """

    def __init__(self, cfg, ecfg, *, param_seed: int = 0,
                 platform: str | None = "cpu",
                 draft_cfg=None, draft_seed: int = 1):
        ctx = mp.get_context("spawn")  # never fork a live JAX runtime
        self._conn, child = ctx.Pipe()
        self._proc = ctx.Process(
            target=_worker_main,
            args=(child, asdict(cfg), asdict(ecfg), param_seed, platform,
                  asdict(draft_cfg) if draft_cfg is not None else None,
                  draft_seed),
            daemon=True,
        )
        # Spawned interpreters re-run sitecustomize, which registers the
        # axon TPU plugin whenever PALLAS_AXON_POOL_IPS is in the env —
        # BEFORE _worker_main's CPU pin can run. A wedged tunnel then hangs
        # the child inside plugin init (observed 2026-08-17: pytest blocked
        # 24 min on the pipe; each worker had an axon retry thread). For a
        # CPU worker, scrub the plugin trigger + pin the platform in the
        # env snapshot the child inherits, restoring the parent's env after
        # start().
        saved: dict[str, str | None] = {}
        if platform == "cpu":
            for var in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS"):
                saved[var] = os.environ.pop(var, None)
            os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            self._proc.start()
        finally:
            for var, val in saved.items():
                if val is None:
                    os.environ.pop(var, None)
                else:
                    os.environ[var] = val
        child.close()
        self._pending = False

    # -- RPC plumbing -------------------------------------------------------

    def _call(self, op: str, payload: Any = None):
        if self._pending:
            raise RuntimeError("run_async in flight; call wait_run first")
        self._conn.send((op, payload))
        status, value = self._conn.recv()
        if status != "ok":
            raise RuntimeError(f"worker error: {value}")
        return value

    # -- ServingEngine surface (what MultiHostScheduler touches) ------------

    def submit(self, request) -> None:
        self._call(
            "submit",
            (request.request_id, list(request.prompt), request.max_new_tokens),
        )

    def step(self) -> None:
        self._call("step")

    @property
    def finished(self) -> dict[int, list[int]]:
        return self._call("status")[2]

    @property
    def waiting(self) -> list:
        return [None] * self._call("status")[0]

    def _num_active(self) -> int:
        return self._call("status")[1]

    def run(self, max_steps: int = 10_000) -> dict[int, list[int]]:
        return self._call("run", max_steps)

    # -- parallel drive across hosts ----------------------------------------

    def run_async(self, max_steps: int = 10_000) -> None:
        """Start a full drain in the worker without blocking; all hosts
        decode concurrently (one OS process each)."""
        self._conn.send(("run", max_steps))
        self._pending = True

    def wait_run(self) -> dict[int, list[int]]:
        status, value = self._conn.recv()
        self._pending = False
        if status != "ok":
            raise RuntimeError(f"worker error: {value}")
        return value

    def close(self) -> None:
        try:
            if not self._pending:
                self._call("shutdown")
        except (BrokenPipeError, EOFError, OSError, RuntimeError):
            pass
        self._proc.join(timeout=10)
        if self._proc.is_alive():
            self._proc.terminate()
        self._conn.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
