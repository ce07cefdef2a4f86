# gpmp_tpu/mcmc/checkpoint.py
"""Checkpoint / resume for long-running samplers.

The reference has no checkpointing anywhere (SURVEY.md section 5:
"Checkpoint / resume: none anywhere"); this module is the TPU build's
addition so multi-hour MH / NUTS / SMC runs survive preemption -- the
normal failure mode of large TPU jobs.

Format: a single ``.npz`` file holding every array of the sampler
state plus a JSON-encoded metadata record (python scalars, mode
strings, format version).  Atomic on POSIX: written to ``path.tmp``
then renamed.  No pickle -- checkpoints are loadable across gpmp_tpu
versions and contain no executable state; the caller re-supplies the
log-target function on resume.
"""

import json
import os

import numpy as np

FORMAT_VERSION = 1
_META_KEY = "__gpmp_tpu_meta__"


def _jsonify(obj):
    """Recursively convert numpy scalars / small arrays to JSON types."""
    if isinstance(obj, dict):
        return {str(k): _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()  # 0-d jax arrays
    return obj


def save_sampler_checkpoint(path, arrays, meta):
    """Atomically write ``arrays`` (dict of array-likes) + ``meta``
    (dict of JSON-serializable scalars/strings/lists) to ``path``."""
    payload = {}
    for name, value in arrays.items():
        if value is None:
            continue
        payload[name] = np.asarray(value)
    meta = dict(meta)
    meta["format_version"] = FORMAT_VERSION
    payload[_META_KEY] = np.frombuffer(
        json.dumps(_jsonify(meta)).encode("utf-8"), dtype=np.uint8
    )
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)


def load_sampler_checkpoint(path):
    """(arrays, meta) from a checkpoint written by
    save_sampler_checkpoint."""
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files if k != _META_KEY}
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode("utf-8"))
    version = meta.get("format_version")
    if version != FORMAT_VERSION:
        raise ValueError(
            f"Unsupported checkpoint format version {version!r} "
            f"(expected {FORMAT_VERSION})."
        )
    return arrays, meta
