"""Orbax-backed checkpointing: metric-keyed top-k retention + full resume.

Reference behavior being reproduced (fit.py:80-85): keep the
``save_topk_models`` best checkpoints by ``val_MulticlassJaccardIndex``
(mode max), with filenames embedding epoch and metric
(``model-{epoch:02d}-{val_MulticlassJaccardIndex:.4f}``); plus the TPU
build's addition of *mid-training resume* (full TrainState: params,
batch_stats, opt_state, step), which the reference lacks entirely
(SURVEY.md §5.4: restore there is inference-only).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

MONITOR_KEY = "val_MulticlassJaccardIndex"

# Marker file distinguishing a slim (eval-only) checkpoint from a full
# TrainState one. Slim checkpoints hold only the leaves evaluation
# consumers read (params / batch_stats / ema_params / step) — ~4x fewer
# bytes than a full state with Adam moments, which matters because the
# device->host transfer dominates the write cost (PERF.md "where the
# minutes go"). Resume points and the final epoch always save full.
SLIM_MARKER = "slim_checkpoint.json"

# Orbax's async save machinery keeps process-global state (signalling /
# atomic-tmp bookkeeping) that corrupts when two checkpointer instances
# save from different threads at once (observed: a save failing mkdir on
# its own `.orbax-checkpoint-tmp`). One manager alone is ordered by its
# single worker thread; this lock additionally serializes across manager
# instances (e.g. a background fit write racing a tool's restore).
_ORBAX_LOCK = threading.Lock()


def lookup_metric(metrics: dict, name: str, default=None):
    """Read a metric tolerating old/new torchmetrics key names.

    The reference accepts both ``test_F1Score`` and ``test_MulticlassF1Score``
    when reading metric dicts (predict.py:245-250); foreign metrics.json files
    may use either convention.
    """
    if name in metrics:
        return metrics[name]
    alt = name.replace("Multiclass", "")
    if alt != name and alt in metrics:
        return metrics[alt]
    prefix, _, bare = name.rpartition("_")
    alt = f"{prefix}_Multiclass{bare}" if prefix else f"Multiclass{bare}"
    if alt in metrics:
        return metrics[alt]
    return default


class CheckpointManager:
    """Top-k best + latest checkpoint retention under ``<exp>/checkpoints``.

    ``async_save=True`` (single-host only) moves the device->host transfer,
    the orbax write, the side files, and the retention deletes onto one
    background worker thread, overlapping checkpoint IO with the next
    epoch's training. The utilization audit (timing.json, PERF.md "where
    the minutes go") measured the synchronous path at ~13 s/epoch vs ~19 s
    of training at the production recipe — almost all of it device->host
    transfer through the remote-device tunnel, which the train loop does
    not need to wait for. Saves stay ordered (one worker); every consumer
    of the index (``best_model_path`` / ``latest_model_path`` /
    ``latest_epoch`` / ``restore``) drains pending writes first, so a
    torn in-flight checkpoint can never be observed as best/latest.

    Safety relies on the saved pytree never being donated afterwards: the
    fit loop saves the *unflattened* epoch-end state, whose buffers are
    fresh jit outputs that training (which advances the flat twin) never
    touches again; the future keeps the pytree alive until written.

    Multi-host forces the synchronous path: orbax's save is a cross-host
    collective and must stay ordered with the epoch-end barrier on the
    main thread (fit.py calls ``multihost.sync`` right after ``save``).
    """

    def __init__(
        self,
        exp_dir: str,
        save_top_k: int = 3,
        monitor: str = MONITOR_KEY,
        async_save: bool = True,
        resume_every: int = 1,
    ):
        self.ckpt_dir = os.path.join(os.path.abspath(exp_dir), "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.resume_every = max(1, int(resume_every))
        self._checkpointer = ocp.StandardCheckpointer()
        self._index_path = os.path.join(self.ckpt_dir, "index.json")
        self._index = self._load_index()
        self._async = bool(async_save) and jax.process_count() == 1
        self._executor = (
            ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt-writer")
            if self._async
            else None
        )
        self._pending: list[Future] = []
        self.background_write_seconds = 0.0

    def _load_index(self) -> dict:
        if os.path.exists(self._index_path):
            with open(self._index_path, "r") as handle:
                return json.load(handle)
        return {"entries": [], "latest": None}

    def _write_index(self) -> None:
        with open(self._index_path, "w") as handle:
            json.dump(self._index, handle, indent=2)

    def _entry_name(self, epoch: int, metric: float) -> str:
        # Filename pattern mirrors the reference's ModelCheckpoint template.
        return f"model-epoch={epoch:02d}-{self.monitor}={metric:.4f}"

    def _settled_index(self) -> dict:
        """The index every process agrees on at decision time.

        Multi-process runs MUST make identical save/skip decisions (the
        orbax save is a collective — a process that skips while another
        saves deadlocks the pod), but only the coordinator maintains
        ``self._index``. The checkpoint directory is shared (class
        docstring) and fit.py barriers (``multihost.sync``) right after
        every save, so re-reading index.json here gives each process the
        coordinator's settled view. Single-process reads the in-memory
        index (the async path drains pending writes before deciding).
        """
        if jax.process_count() > 1:
            return self._load_index()
        return self._index

    def _save_kind(
        self, epoch: int, metric: float, force: bool
    ) -> str | None:
        """``"full"``, ``"slim"``, or ``None`` (skip) for this epoch.

        A full-TrainState write through the remote-device tunnel costs
        ~10-20 s — several steady training epochs at the production
        recipe. Lightning's ModelCheckpoint (the reference contract,
        fit.py:80-85) only writes when a metric enters the top-k; the
        every-epoch "latest" here is a beyond-reference resume-
        granularity extra that does not need every-epoch cadence:
        resume is deterministic (ARCHITECTURE.md), so restarting from an
        up-to-``resume_every``-epochs-old checkpoint retrains the gap
        bit-identically at ~4-5 s/epoch. Top-k entries that are NOT
        resume points save *slim* (eval leaves only, ~4x fewer bytes —
        evaluation consumers never read Adam moments); resume points and
        the forced final epoch save the full state.
        """
        is_resume_point = force or epoch % self.resume_every == 0
        # NOTE: entries also retains the latest (resume) checkpoint, whose
        # metric is usually low — the top-k floor must be computed over
        # the k best metrics only, or nearly every epoch "enters top-k"
        # (measured on hardware: 33/33 writes with the naive min()).
        top = sorted(
            (e["metric"] for e in self._settled_index()["entries"]),
            reverse=True,
        )[: self.save_top_k]
        enters_topk = len(top) < self.save_top_k or metric > top[-1]
        if is_resume_point:
            return "full"
        if enters_topk:
            return "slim"
        return None

    def save(
        self, state: Any, epoch: int, metrics: dict, force: bool = False
    ) -> str | None:
        """Save a checkpoint; retain top-k by monitored metric + the latest.

        Returns None when the epoch is skipped (see ``_save_kind``;
        ``force=True`` — the fit's final epoch — always writes, so a
        completed run always has a latest for the no-op re-invoke path).

        Async mode returns as soon as the write is queued (the returned
        path exists only once the background worker finishes it; drain
        with :meth:`wait_until_finished` or any index property).

        Multi-host: MUST be called on every process — orbax's save is a
        collective (it synchronizes all hosts internally). Side files
        (metrics.json, index.json) and retention deletes are written by the
        coordinator only; the checkpoint directory is assumed shared.
        """
        metric = float(lookup_metric(metrics, self.monitor, 0.0))
        name = self._entry_name(epoch, metric)
        path = os.path.join(self.ckpt_dir, name)
        # Slim layout presumes a TrainState-shaped pytree; arbitrary
        # pytrees (tests, tools) always save full.
        slim_able = hasattr(state, "params") and hasattr(state, "replace")
        if self._executor is None:
            kind = self._save_kind(epoch, metric, force)
            if kind == "slim" and not slim_able:
                kind = "full"
            if kind is None:
                return None
            self._write(path, state, epoch, metrics, metric, name, kind)
            return path
        # At most one write in flight: epoch N's write had all of epoch
        # N+1's training to finish, so this wait is normally instant; it
        # bounds HBM pinned by queued pytrees and re-raises write errors
        # at the save site instead of at the end of the fit. Draining
        # BEFORE the skip decision also makes _save_kind read a
        # settled index.
        self.wait_until_finished()
        kind = self._save_kind(epoch, metric, force)
        if kind == "slim" and not slim_able:
            kind = "full"
        if kind is None:
            return None
        payload = state if kind == "full" else _slim_of(state)
        self._pending.append(
            self._executor.submit(
                self._write, path, _snapshot_device_leaves(payload), epoch,
                metrics, metric, name, kind
            )
        )
        return path

    def wait_until_finished(self) -> None:
        """Block until every queued save has been written; re-raise errors."""
        pending, self._pending = self._pending, []
        for future in pending:
            future.result()

    def _write(
        self,
        path: str,
        state: Any,
        epoch: int,
        metrics: dict,
        metric: float,
        name: str,
        kind: str = "full",
    ) -> None:
        start = time.time()
        coordinator = jax.process_index() == 0
        if coordinator and os.path.exists(path):
            shutil.rmtree(path)
        payload = state
        if kind == "slim" and not isinstance(state, dict):
            payload = _slim_of(state)  # sync path slims at write time
        with _ORBAX_LOCK:
            self._checkpointer.save(path, _to_saveable(payload))
            self._checkpointer.wait_until_finished()
        if not coordinator:
            return
        if kind == "slim":
            with open(os.path.join(path, SLIM_MARKER), "w") as handle:
                json.dump({"layout": sorted(payload)}, handle)
        with open(os.path.join(path, "metrics.json"), "w") as handle:
            json.dump(
                {k: _scalar(v) for k, v in metrics.items()} | {"epoch": epoch},
                handle,
                indent=2,
            )

        entries = [e for e in self._index["entries"] if e["name"] != name]
        entries.append(
            {"name": name, "metric": metric, "epoch": epoch, "kind": kind}
        )
        entries.sort(key=lambda e: e["metric"], reverse=True)
        keep = entries[: self.save_top_k]
        # Resume must restore a FULL state (slim checkpoints carry no
        # optimizer moments), so `latest` tracks the newest full entry;
        # entries missing "kind" predate slim checkpoints and are full.
        full = [e for e in entries if e.get("kind", "full") == "full"]
        latest = max(full, key=lambda e: e["epoch"]) if full else None
        keep_names = {e["name"] for e in keep}
        if latest is not None:
            keep_names.add(latest["name"])
        for entry in entries[self.save_top_k :]:
            if entry["name"] not in keep_names:
                stale = os.path.join(self.ckpt_dir, entry["name"])
                if os.path.exists(stale):
                    shutil.rmtree(stale)
        self._index["entries"] = [
            e for e in entries if e["name"] in keep_names
        ]
        self._index["latest"] = latest["name"] if latest else None
        self._write_index()
        self.background_write_seconds += time.time() - start

    @property
    def best_model_path(self) -> str | None:
        self.wait_until_finished()
        if not self._index["entries"]:
            return None
        best = max(self._index["entries"], key=lambda e: e["metric"])
        return os.path.join(self.ckpt_dir, best["name"])

    @property
    def latest_model_path(self) -> str | None:
        self.wait_until_finished()
        if self._index["latest"] is None:
            return None
        return os.path.join(self.ckpt_dir, self._index["latest"])

    @property
    def latest_epoch(self) -> int | None:
        self.wait_until_finished()
        if self._index["latest"] is None:
            return None
        for entry in self._index["entries"]:
            if entry["name"] == self._index["latest"]:
                return entry["epoch"]
        return None

    def restore(self, path: str, target: Any) -> Any:
        """Restore into the structure of ``target`` (a template TrainState).

        Slim checkpoints (see :data:`SLIM_MARKER`) restore their eval
        leaves and graft them onto ``target``; the optimizer state keeps
        the template's (fresh-init) values — evaluation consumers never
        read it, and resume never targets a slim checkpoint
        (``latest_model_path`` only tracks full entries).
        """
        self.wait_until_finished()
        if _is_slim(path):
            return _restore_slim(self._checkpointer, path, target)
        with _ORBAX_LOCK:
            return self._checkpointer.restore(path, _to_saveable(target))


def _jit_tree_copy(xs):
    import jax.numpy as jnp

    return tuple(jnp.copy(x) for x in xs)


_jit_tree_copy = jax.jit(_jit_tree_copy)


def _snapshot_device_leaves(state):
    """Identity-copy every ``jax.Array`` leaf into fresh device buffers.

    An async save must decouple the queued pytree from training: the fit
    loop's unflattened epoch-end state passes SOME leaves through from
    the flat training state by reference (e.g. the int32 step counter),
    and the next train step *donates* that flat state — deleting those
    buffers under a background write that hasn't transferred them yet
    (observed on hardware: "Array has been deleted with shape=int32[]").
    One jitted copy program (single dispatch, on-device HBM copy, ~ms)
    produces unaliased buffers the snapshot alone owns; non-Array leaves
    (host numpy, python scalars) are immune to donation and pass through.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    array_idx = [
        i for i, leaf in enumerate(leaves) if isinstance(leaf, jax.Array)
    ]
    if array_idx:
        copied = _jit_tree_copy(tuple(leaves[i] for i in array_idx))
        leaves = list(leaves)
        for i, fresh in zip(array_idx, copied):
            leaves[i] = fresh
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _slim_of(state):
    """Eval-relevant leaves of a TrainState as a plain dict pytree.

    Keys absent from the state (no BN stats, no EMA) are omitted rather
    than stored as None so the saved layout documents itself (the
    restore side rebuilds the same dict from its template).
    """
    out = {"step": state.step, "params": state.params}
    if state.batch_stats is not None:
        out["batch_stats"] = state.batch_stats
    if state.ema_params is not None:
        out["ema_params"] = state.ema_params
    return out


def _is_slim(path: str) -> bool:
    return os.path.exists(os.path.join(path, SLIM_MARKER))


def _restore_slim(checkpointer, path: str, target: Any) -> Any:
    """Restore a slim checkpoint and graft it onto a full template."""
    with open(os.path.join(path, SLIM_MARKER), "r") as handle:
        layout = set(json.load(handle).get("layout", []))
    template = {
        k: v for k, v in _slim_of(target).items() if k in layout
    }
    missing = layout - set(template)
    if missing:
        raise ValueError(
            f"slim checkpoint {path} stores leaves {sorted(missing)} the "
            "restore template lacks — rebuild the template with the "
            "experiment's training config (e.g. ema_decay for ema_params)"
        )
    with _ORBAX_LOCK:
        restored = checkpointer.restore(
            os.path.abspath(path), _to_saveable(template)
        )
    # The checkpoint's layout is the truth about what the run trained
    # with: a template carrying optional leaves (ema_params/batch_stats)
    # the checkpoint lacks must not keep its fresh-init values — predict
    # would silently evaluate an untrained EMA.
    for optional in ("ema_params", "batch_stats"):
        if optional not in layout:
            restored[optional] = None
    return target.replace(**restored)


def _scalar(value):
    if isinstance(value, (int, float, str)):
        return value
    return float(np.asarray(value))


def _to_saveable(state):
    """Host-side pytree of numpy arrays for save/restore templates."""
    return jax.tree.map(lambda x: np.asarray(x), state)


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a checkpoint directory into ``target``'s structure.

    Used by predict/infer (the analog of load_from_checkpoint,
    predict.py:174-177, infer.py:96-99). Handles both full-TrainState
    and slim (eval-only) checkpoints; slim restores graft params /
    batch_stats / ema_params / step onto the template and leave its
    optimizer state at init, which no evaluation consumer reads.
    """
    checkpointer = ocp.StandardCheckpointer()
    if _is_slim(path):
        return _restore_slim(checkpointer, path, target)
    with _ORBAX_LOCK:
        return checkpointer.restore(os.path.abspath(path), _to_saveable(target))
