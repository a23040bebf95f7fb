"""TPU-native serving surface: AOT-exported predictors + fixed-shape
micro-batching.

The reference has no serving story — its models are only exercised through
the evaluation driver (reference evaluate.py:60-160). Production serving on
TPU wants three things the training-side APIs don't give you:

1. a compiled forward with the WEIGHTS BAKED IN and fixed shapes (no
   retracing, no Python model object at serve time);
2. an export format that survives process restarts and ships to a serving
   binary — `jax.export` serializes the jitted computation to versioned
   StableHLO bytes, loadable without the model code;
3. request batching that respects the fixed compiled batch: XLA programs
   are shape-specialized, so arbitrary request counts must be chunked and
   padded to the compiled batch size, never retraced.

`make_serving_fn` builds (1), `export_predictor`/`load_predictor` handle
(2), and `serve_many` implements (3). The prediction path is the same
forward + on-device decode/NMS the evaluation driver uses
(evaluation.make_predict_fn), so serving results match `evaluate.py`.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops.anchors import anchor_table
from .ops.postprocess import (Detections, class_validity_table,
                              postprocess_detections)

__all__ = ['make_serving_fn', 'export_predictor', 'load_predictor',
           'serve_many']

_SERIALIZATION_REGISTERED = False


def _ensure_serialization_registered():
    """jax.export can only serialize registered pytree containers; register
    the Detections namedtuple once (idempotent across calls)."""
    global _SERIALIZATION_REGISTERED
    if _SERIALIZATION_REGISTERED:
        return
    from jax import export as jax_export
    jax_export.register_namedtuple_serialization(
        Detections, serialized_name='mm_distillnet_tpu.Detections')
    _SERIALIZATION_REGISTERED = True


def make_serving_fn(model, variables, image_size: int, *,
                    conf_threshold: float = 0.3,
                    nms_threshold: float = 0.5,
                    num_candidates: int = 512,
                    max_detections: int = 100,
                    approx: bool = False,
                    valid_prediction_ids: Optional[Sequence[int]] = None,
                    num_classes: int = 20,
                    mesh=None,
                    quant_pack=None) -> Callable[[jnp.ndarray], Detections]:
    """Weight-baked jitted predictor: images (B,H,W,C) -> Detections.

    `variables` are closed over (donated to the compiled executable as
    constants), so the returned function — and anything exported from it —
    is self-contained. Thresholds mirror the shipped eval defaults
    (reference configs/mm-distillnet.cfg:117-119).

    With `mesh` (a 1-D `data` Mesh, parallel.mesh.create_mesh) the batch
    dim is sharded over the mesh — multi-chip serving on a v5e-8 slab is
    the same call with a bigger batch; XLA partitions the program, no
    collectives needed (batch-parallel inference).

    With `quant_pack` (quant.build_quant_pack) the forward runs the int8
    path (quant.quantized_apply): same module tree, packed convs as
    s8xs8->s32, scales baked — the bandwidth-bound graph moves half the
    bytes (see the roofline in BENCH_NOTES.md). Export/micro-batching
    compose unchanged.
    """
    anchors = jnp.asarray(anchor_table(image_size))
    if valid_prediction_ids is None:
        valid_prediction_ids = [6]  # 'car', the shipped target class
    class_valid = jnp.asarray(
        class_validity_table(num_classes, list(valid_prediction_ids)))

    def predict(x: jnp.ndarray) -> Detections:
        if x.shape[-3] != image_size:
            # compact audio ingest: callers may ship the (B, 80, S, M)
            # time-stretched spectrogram stack and pay 9.6x fewer infeed
            # bytes; the mel axis is stretched here on-device
            # (ops/resize.stretch_mel_axis, cv2-exact). maybe_* raises on
            # heights that are neither image_size nor the 80 mel bins.
            from .ops.resize import maybe_stretch_mel_axis
            x = maybe_stretch_mel_axis(x, image_size)
        if quant_pack is not None:
            from .quant import quantized_apply
            out = quantized_apply(model, variables, quant_pack, x,
                                  train=False)
        else:
            out = model.apply(variables, x, train=False)
        return postprocess_detections(
            out.classification, out.regression, anchors, class_valid,
            image_size=image_size, conf_threshold=conf_threshold,
            nms_threshold=nms_threshold, num_candidates=num_candidates,
            max_detections=max_detections, approx=approx)

    if mesh is not None:
        from .parallel.mesh import batch_sharding
        sh = batch_sharding(mesh)
        return jax.jit(predict, in_shardings=sh, out_shardings=sh)
    return jax.jit(predict)


def export_predictor(predict_fn, batch_size: int, image_size: int,
                     channels: int, path: str, *,
                     platforms: Optional[Sequence[str]] = None) -> None:
    """Serialize `predict_fn` (from make_serving_fn, weights baked) to
    versioned StableHLO bytes at `path`.

    The artifact replays on any process with jax installed — the model
    code, flax, and the weights pickle are NOT needed at serve time.
    `platforms` defaults to the exporting backend; pass e.g. ('tpu',) to
    cross-export from a CPU host.
    """
    from jax import export as jax_export
    _ensure_serialization_registered()
    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size,
                                 channels), jnp.float32)
    exported = jax_export.export(
        predict_fn, platforms=list(platforms) if platforms else None)(spec)
    with open(path, 'wb') as f:
        f.write(exported.serialize())


def load_predictor(path: str) -> Callable[[jnp.ndarray], Detections]:
    """Load an export_predictor artifact; returns images -> Detections."""
    from jax import export as jax_export
    _ensure_serialization_registered()
    with open(path, 'rb') as f:
        exported = jax_export.deserialize(f.read())

    def predict(x: jnp.ndarray) -> Detections:
        return Detections(*exported.call(x))

    return predict


def serve_many(predict_fn, images: np.ndarray,
               batch_size: int) -> Detections:
    """Run an ARBITRARY number of images through a fixed-batch compiled
    predictor: chunk to `batch_size`, zero-pad the tail chunk (XLA
    programs are shape-specialized — feeding a short batch would retrace
    or fail), and concatenate the real rows back out."""
    n = images.shape[0]
    outs = []
    for start in range(0, n, batch_size):
        chunk = images[start:start + batch_size]
        real = chunk.shape[0]
        if real < batch_size:
            pad = np.zeros((batch_size - real,) + chunk.shape[1:],
                           chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        dets = predict_fn(jnp.asarray(chunk))
        outs.append(jax.tree_util.tree_map(
            lambda a, r=real: np.asarray(a[:r]), dets))
    return Detections(*(np.concatenate([getattr(o, f) for o in outs], axis=0)
                        for f in Detections._fields))
