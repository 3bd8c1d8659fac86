"""Directory-watching batch server over the fused study pipeline.

A production-serving wrapper the reference lacks (its nearest surface is
the ad-hoc ``Model.test_inference``, reference training/models/base.py:83-166):
requests are JSON files ``{"study_id": str, "t1": path, "t2": path}``
dropped into a watch directory; the server drains the backlog in batches
through ONE compiled fused graph (the pipeline's power-of-two bucketing
keeps request-count variation from retracing), writes ``<study_id>.json``
results (the same payload as ``spine-vision-tpu infer``), and moves each
processed request file to ``done/`` — or to ``failed/`` with a sidecar
error file when a request is malformed or its volumes cannot be read.

Host IO overlaps device compute: volume decode + middle-slice extraction
costs tens of ms per study — more than the ~7 ms/study fused graph — so a
prefetch thread loads the NEXT batch while the device runs the current
one. Batches are claimed by atomically renaming request files into a
per-server ``inflight/<host>-<pid>/`` directory (so a concurrent server can
never double-pick, and a *starting* server can tell a live sibling's claims
from a crashed server's). Startup recovery re-queues inflight requests
whose owning pid on this host is dead; a foreign host's claims are left
alone (scale-out across hosts should use per-host watch directories).
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from spine_vision_tpu.core import logger
from spine_vision_tpu.infer.pipeline import (
    StudyInferencePipeline,
    StudyInput,
    study_input_from_paths,
)


@dataclass
class ServeStats:
    """Counters returned by :func:`serve_directory`."""

    processed: int = 0
    failed: int = 0
    batches: int = 0
    study_ids: list[str] = field(default_factory=list)


def _result_payload(result: Any) -> dict:
    return {
        "study_id": result.study_id,
        "coords": result.coords.tolist(),
        "predictions": {k: v.tolist() for k, v in result.predictions.items()},
        "probabilities": {
            k: v.tolist() for k, v in result.probabilities.items()
        },
    }


def _load_request(path: Path) -> StudyInput:
    spec = json.loads(path.read_text())
    if not isinstance(spec, dict) or "t1" not in spec or "t2" not in spec:
        raise ValueError(f"request {path.name} must carry 't1' and 't2' paths")
    return study_input_from_paths(
        Path(spec["t1"]),
        Path(spec["t2"]),
        study_id=str(spec.get("study_id") or path.stem),
    )


@dataclass
class _Batch:
    """One claimed+decoded request batch (produced by the prefetch thread)."""

    studies: list[StudyInput] = field(default_factory=list)
    paths: list[Path] = field(default_factory=list)  # inflight paths, 1:1
    failures: list[tuple[Path, str]] = field(default_factory=list)

    def __bool__(self) -> bool:
        return bool(self.studies or self.failures)


def _claim_and_load(
    watch_dir: Path, inflight_dir: Path, max_batch: int
) -> _Batch:
    """Atomically claim up to ``max_batch`` requests and decode their volumes.

    Runs on the prefetch thread; claiming = renaming into ``inflight/``, so
    a concurrent claim can never pick the same file (rename fails).
    """
    def _mtime(p: Path) -> float:
        # A concurrent server can rename the file away between glob() and
        # stat(); a vanished entry must not kill the prefetch thread — the
        # rename below is the claim arbiter, so just sort it last.
        try:
            return p.stat().st_mtime
        except OSError:
            return float("inf")

    requests = sorted(watch_dir.glob("*.json"), key=_mtime)[:max_batch]
    batch = _Batch()
    for path in requests:
        staged = inflight_dir / path.name
        try:
            path.rename(staged)
        except OSError:
            continue  # claimed elsewhere / vanished
        try:
            batch.studies.append(_load_request(staged))
            batch.paths.append(staged)
        except Exception as exc:  # noqa: BLE001 — isolate bad requests
            batch.failures.append((staged, str(exc)))
    return batch


def serve_directory(
    pipeline: StudyInferencePipeline,
    watch_dir: Path,
    output_dir: Path,
    poll_interval: float = 0.5,
    max_batch: int = 16,
    once: bool = False,
    stop_event: Any = None,
) -> ServeStats:
    """Drain ``watch_dir/*.json`` requests through the fused pipeline.

    Args:
        pipeline: A constructed :class:`StudyInferencePipeline`.
        watch_dir: Directory receiving request JSON files.
        output_dir: Directory receiving ``<study_id>.json`` results.
        poll_interval: Sleep between empty polls (seconds).
        max_batch: Maximum studies per fused-graph call.
        once: Drain the current backlog, then return.
        stop_event: Optional ``threading.Event``-like; set to stop the loop.

    Returns:
        ServeStats with processed/failed counts.
    """
    watch_dir = Path(watch_dir)
    output_dir = Path(output_dir)
    done_dir = watch_dir / "done"
    failed_dir = watch_dir / "failed"
    inflight_dir = watch_dir / "inflight"
    for d in (watch_dir, output_dir, done_dir, failed_dir, inflight_dir):
        d.mkdir(parents=True, exist_ok=True)

    # Per-server claim directory: a starting server must not "recover" a
    # LIVE sibling's claims (same watch dir, two servers is a supported
    # config) — ownership is encoded in the directory name and liveness is
    # checked by pid on this host.
    host = socket.gethostname()
    claim_dir = inflight_dir / f"{host}-{os.getpid()}"
    claim_dir.mkdir(parents=True, exist_ok=True)

    # Crash recovery: re-queue claims whose owner is dead. Loose files at
    # the inflight root (older layout) are always re-queued. Every rename
    # tolerates FileNotFoundError: two servers restarted together race to
    # recover the same orphans, and the loser finding the file already moved
    # is the success case, not a startup crash.
    def _requeue(orphan: Path, what: str) -> None:
        try:
            orphan.rename(watch_dir / orphan.name)
        except FileNotFoundError:
            return  # a sibling server recovered it first
        logger.warning("Re-queueing %s %s", what, orphan.name)

    for orphan in inflight_dir.glob("*.json"):
        _requeue(orphan, "orphaned inflight request")
    # PID reuse: our own claim dir may be a dead predecessor's (same host,
    # recycled pid). Nothing in it can be ours yet — re-queue it all.
    for orphan in claim_dir.glob("*.json"):
        _requeue(orphan, "stale inflight request (recycled pid)")
    for owner_dir in (d for d in inflight_dir.iterdir() if d.is_dir()):
        if owner_dir == claim_dir:
            continue
        owner_host, _, owner_pid = owner_dir.name.rpartition("-")
        if owner_host != host:
            continue  # cannot check a foreign host's liveness
        try:
            os.kill(int(owner_pid), 0)
            continue  # owner alive: its claims are not orphans
        except (ValueError, ProcessLookupError):
            pass  # dead or unparseable owner: recover
        except PermissionError:
            continue  # alive under another uid
        for orphan in owner_dir.glob("*.json"):
            _requeue(orphan, f"inflight request (dead server {owner_dir.name})")
        try:
            owner_dir.rmdir()
        except OSError:
            pass  # non-empty (non-json debris) or concurrently recovered

    stats = ServeStats()
    try:
        return _serve_loop(
            pipeline, watch_dir, output_dir, done_dir, failed_dir, claim_dir,
            poll_interval, max_batch, once, stop_event, stats,
        )
    finally:
        try:
            claim_dir.rmdir()  # leave no empty owner dir behind
        except OSError:
            pass


def _serve_loop(
    pipeline: StudyInferencePipeline,
    watch_dir: Path,
    output_dir: Path,
    done_dir: Path,
    failed_dir: Path,
    claim_dir: Path,
    poll_interval: float,
    max_batch: int,
    once: bool,
    stop_event: Any,
    stats: ServeStats,
) -> ServeStats:
    with ThreadPoolExecutor(max_workers=1) as pool:
        claim = lambda: _claim_and_load(watch_dir, claim_dir, max_batch)  # noqa: E731
        pending = pool.submit(claim)
        while True:
            batch = pending.result()
            if not batch:
                if once or (stop_event is not None and stop_event.is_set()):
                    return stats
                time.sleep(poll_interval)
                pending = pool.submit(claim)
                continue

            # Prefetch the next batch while the device runs this one.
            pending = pool.submit(claim)

            for path, err in batch.failures:
                stats.failed += 1
                (failed_dir / f"{path.stem}.error.txt").write_text(err)
                shutil.move(str(path), failed_dir / path.name)
                logger.warning("Rejected request %s: %s", path.name, err)

            if batch.studies:
                start = time.perf_counter()
                # The serve payload carries coords/predictions only — skip
                # the crop tensor's device->host transfer (the largest
                # output by far).
                results = pipeline.run(batch.studies, fetch_crops=False)
                elapsed = time.perf_counter() - start
                stats.batches += 1
                for path, result in zip(batch.paths, results):
                    out_path = output_dir / f"{result.study_id}.json"
                    out_path.write_text(
                        json.dumps(_result_payload(result), indent=2)
                    )
                    shutil.move(str(path), done_dir / path.name)
                    stats.processed += 1
                    stats.study_ids.append(result.study_id)
                logger.info(
                    "Served batch of %d studies in %.1f ms (%.1f ms/study)",
                    len(batch.studies),
                    elapsed * 1000.0,
                    elapsed * 1000.0 / len(batch.studies),
                )

            if stop_event is not None and stop_event.is_set():
                # Clean shutdown: return the prefetched claim to the queue.
                leftover = pending.result()
                for path in leftover.paths + [p for p, _ in leftover.failures]:
                    path.rename(watch_dir / path.name)
                return stats
