"""Checkpoint save/load: iter-stamped npz archives of parameter pytrees +
optimizer state, with the reference's directory layout and resume semantics.

Behavior parity (SURVEY.md §5.4): files land in
{base_exp_dir}/checkpoints/ckpt_{iter:06d}.npz; `latest_checkpoint` scans for
the newest stamp <= end_iter (ref:exp_runner.py:107-118); logical groups use
the reference's key names (nerf, sdf_network_fine, variance_network_fine,
color_network_fine, refColor_network, lvis_network, indiLgt_network,
mateIllu_network, optimizer, iter_step; ref:exp_runner.py:266-278,
lvis.py:255-269, mateIllu.py:269-284) so stage chaining works identically.

Format: a single .npz whose keys are `<group>/<flattened pytree path>`, plus
a JSON treedef sidecar entry — self-contained, no orbax daemon, atomic via
temp-file rename.
"""
from __future__ import annotations

import atexit
import io
import json
import logging
import os
import re
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

_SEP = "/"

# In-flight async writers, keyed by base_exp_dir (one in flight per
# directory; a lock guards the maps so concurrent runners in one process —
# e.g. two stages chained in a test — cannot race each other's slots, and
# latest_checkpoint on one directory never joins an unrelated write).
_ASYNC_LOCK = threading.Lock()
_ASYNC_THREADS: Dict[str, threading.Thread] = {}
_ASYNC_ERRORS: Dict[str, BaseException] = {}


@atexit.register
def _drain_at_exit() -> None:
    """Last line of defense: if the process exits with a failed write still
    pending (e.g. the final save_checkpoint was the last statement), make
    the failure loud on stderr — the write() thread already logged it, but
    logging may be torn down or redirected by then."""
    err = _join_writer(clear_error=False)
    if err is not None:
        import sys
        print(f"ERROR: async checkpoint write FAILED and was never "
              f"drained: {err!r}", file=sys.stderr)


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    paths_leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths_leaves:
        key = _SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    return str(entry)


def _treedef_spec(tree) -> Any:
    """JSON-serializable structure mirror (dicts/lists with None leaves).
    Tuples are tagged so they round-trip as tuples — list vs tuple are
    distinct jax pytree node types, and a resume that silently turned a
    tuple into a list would no longer match a fresh init's treedef."""
    if isinstance(tree, dict):
        return {k: _treedef_spec(v) for k, v in tree.items()}
    if isinstance(tree, tuple):
        return {"__tuple__": [_treedef_spec(v) for v in tree]}
    if isinstance(tree, list):
        return [_treedef_spec(v) for v in tree]
    return None


def _unflatten(spec, flat: Dict[str, np.ndarray], prefix: str = ""):
    if isinstance(spec, dict):
        if set(spec) == {"__tuple__"}:
            return tuple(_unflatten(v, flat, prefix + str(i) + _SEP)
                         for i, v in enumerate(spec["__tuple__"]))
        return {k: _unflatten(v, flat, prefix + k + _SEP)
                for k, v in spec.items()}
    if isinstance(spec, list):
        return [_unflatten(v, flat, prefix + str(i) + _SEP)
                for i, v in enumerate(spec)]
    return flat[prefix[:-1]]


def _is_plain(tree) -> bool:
    """True when the tree is pure dict/list/tuple/leaf (round-trippable via
    the JSON spec).  Optimizer states contain optax namedtuples and custom
    nodes — those go through leaves-mode instead."""
    if type(tree) is dict:
        return all(_is_plain(v) for v in tree.values())
    if type(tree) in (list, tuple):
        return all(_is_plain(v) for v in tree)
    import jax.numpy as jnp
    return isinstance(tree, (np.ndarray, jnp.ndarray, int, float, bool,
                             np.generic))


def restore_into(template, leaves) -> Any:
    """Rebuild an arbitrary pytree (e.g. optax state) from stored leaves
    using the caller's freshly-initialized structure as the template."""
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp_like(t, l) for t, l in
                  zip(jax.tree_util.tree_leaves(template), leaves)])


def jnp_like(template_leaf, value):
    import jax.numpy as jnp
    arr = jnp.asarray(value)
    return arr.astype(template_leaf.dtype) if hasattr(template_leaf, "dtype") \
        else arr


def save_checkpoint(base_exp_dir: str, iter_step: int,
                    groups: Dict[str, Any]) -> str:
    """groups: name -> pytree (params / optimizer state / scalars)."""
    ckpt_dir = os.path.join(base_exp_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    spec: Dict[str, Any] = {}
    for name, tree in groups.items():
        tree = jax.device_get(tree)
        if not _is_plain(tree):
            # arbitrary pytree (optax states): store ordered leaves; the
            # loader rebuilds against a freshly-initialized template via
            # `restore_into`
            leaves = jax.tree_util.tree_leaves(tree)
            spec[name] = {"__leaves__": len(leaves)}
            for i, leaf in enumerate(leaves):
                arrays[f"{name}{_SEP}__leaf{i}__"] = np.asarray(leaf)
            continue
        spec[name] = _treedef_spec(tree)
        if spec[name] is None:                      # bare array/scalar
            arrays[name] = np.asarray(tree)
        else:
            for k, v in _flatten(tree).items():
                arrays[f"{name}{_SEP}{k}"] = v
    arrays["__spec__"] = np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8)
    path = os.path.join(ckpt_dir, f"ckpt_{iter_step:06d}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as z:
        spec = json.loads(bytes(z["__spec__"]).decode())
        flat = {k: z[k] for k in z.files if k != "__spec__"}
    out = {}
    for name, s in spec.items():
        if s is None:
            out[name] = flat[name]
        elif isinstance(s, dict) and "__leaves__" in s:
            out[name] = [flat[f"{name}{_SEP}__leaf{i}__"]
                         for i in range(s["__leaves__"])]
        else:
            sub = {k[len(name) + 1:]: v for k, v in flat.items()
                   if k.startswith(name + _SEP)}
            out[name] = _unflatten(s, sub)
    return out


def _writer_key(base_exp_dir: Optional[str]) -> Optional[str]:
    return None if base_exp_dir is None else os.path.abspath(base_exp_dir)


def _join_writer(base_exp_dir: Optional[str] = None,
                 clear_error: bool = True) -> Optional[BaseException]:
    """Join in-flight writer(s) — the given directory's, or ALL of them when
    base_exp_dir is None; return the first error, if any (cleared unless
    clear_error=False — read-only callers must leave it for the save/drain
    sites to surface)."""
    key = _writer_key(base_exp_dir)
    with _ASYNC_LOCK:
        if key is None:
            threads = list(_ASYNC_THREADS.values())
            keys = list(_ASYNC_THREADS.keys()) or list(_ASYNC_ERRORS.keys())
        else:
            t = _ASYNC_THREADS.get(key)
            threads = [t] if t is not None else []
            keys = [key]
    for t in threads:
        t.join()
    err = None
    with _ASYNC_LOCK:
        for k in keys:
            e = _ASYNC_ERRORS.get(k)
            if e is not None:
                if err is None:
                    err = e
                if clear_error:
                    del _ASYNC_ERRORS[k]
    return err


def wait_for_async_saves() -> None:
    """Block until every in-flight async checkpoint write has finished.
    Re-raises an error from a background writer (e.g. disk full) so a
    failed save surfaces on the training thread instead of vanishing."""
    err = _join_writer()
    if err is not None:
        raise RuntimeError("async checkpoint write failed") from err


def save_checkpoint_async(base_exp_dir: str, iter_step: int,
                          groups: Dict[str, Any]) -> None:
    """Non-blocking save_checkpoint: the device->host fetch and npz write
    run in a background thread so the train loop keeps stepping (the fetch
    alone costs seconds per save on slow host links).

    Donation safety: device leaves are snapshotted with an on-device copy
    BEFORE returning — the copy is dispatched in stream order ahead of the
    next train step, so the step's buffer donation cannot alias the data
    being written.  One save per directory is in flight at a time (a new
    call joins the previous writer for the same directory: ordering +
    bounded host memory); the writer thread is non-daemon so an interpreter
    exit drains pending writes, and the atomic tmp-file rename in
    save_checkpoint means a hard kill can only lose the newest file, never
    corrupt one.  Call wait_for_async_saves() before reading the newest
    file back in-process (latest_checkpoint does this automatically)."""
    import jax.numpy as jnp

    def snap(leaf):
        return jnp.copy(leaf) if isinstance(leaf, jax.Array) else leaf

    snapped = {name: jax.tree_util.tree_map(snap, tree)
               for name, tree in groups.items()}
    key = _writer_key(base_exp_dir)
    prev_err = _join_writer(base_exp_dir)
    # join BEFORE raising: a transient failure of the previous write must
    # not also drop THIS (healthy) checkpoint

    def write():
        try:
            save_checkpoint(base_exp_dir, iter_step, snapped)
        except BaseException as e:
            # log IMMEDIATELY (a failed save whose process exits before the
            # next drain must not be silent), then store for re-raise at the
            # next save/drain; strip the traceback so the stored exception
            # does not pin the full device+host snapshot via frame refs
            logging.getLogger("factored_neus_tpu").error(
                "async checkpoint write to %s (iter %d) FAILED: %s",
                base_exp_dir, iter_step, e, exc_info=True)
            with _ASYNC_LOCK:
                _ASYNC_ERRORS[key] = e.with_traceback(None)

    t = threading.Thread(target=write, name=f"ckpt-writer-{iter_step}",
                         daemon=False)
    with _ASYNC_LOCK:
        _ASYNC_THREADS[key] = t
    t.start()
    if prev_err is not None:
        raise RuntimeError("async checkpoint write failed") from prev_err


_CKPT_RE = re.compile(r"ckpt_(\d+)\.npz$")


def latest_checkpoint(base_exp_dir: str,
                      end_iter: Optional[int] = None) -> Optional[str]:
    """Newest stamped checkpoint <= end_iter, or None.
    ref:exp_runner.py:107-118."""
    # an in-flight async write to THIS directory may be the newest file:
    # join it, but do NOT re-raise (or clear) a stale writer error here —
    # this is a read-only lookup; errors surface at the save and drain
    # sites, which know which write they belong to.  Warn, though: if the
    # failed write was this directory's newest checkpoint, the caller is
    # about to chain from a stale one.
    pending_err = _join_writer(base_exp_dir, clear_error=False)
    if pending_err is not None:
        logging.getLogger("factored_neus_tpu").warning(
            "scanning %s for checkpoints while an async write has FAILED "
            "(%s) — the newest checkpoint may be missing", base_exp_dir,
            pending_err)
    ckpt_dir = os.path.join(base_exp_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_it = -1
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if not m:
            continue
        it = int(m.group(1))
        if end_iter is not None and it > end_iter:
            continue
        if it > best_it:
            best_it = it
            best = os.path.join(ckpt_dir, name)
    return best
