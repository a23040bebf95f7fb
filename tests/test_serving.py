"""Serving surface: weight-baked predictor, AOT export round-trip,
fixed-batch micro-batching.

The reference has no serving path (models only run under evaluate.py,
reference evaluate.py:60-160); this is the TPU-build's deployment story:
jax.export StableHLO artifacts + shape-disciplined batching.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from mm_distillnet_tpu.models.efficientdet import EfficientDet
from mm_distillnet_tpu.serving import (export_predictor, load_predictor,
                                       make_serving_fn, serve_many)

from .helpers import fast_init

SIZE = 128
BATCH = 2


def _build():
    model = EfficientDet(num_classes=20, compound_coef=-1,
                         dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 8))
    variables = fast_init(model, 1, x)
    return model, variables, x


def test_serving_fn_matches_direct_apply():
    model, variables, x = _build()
    predict = make_serving_fn(model, variables, SIZE,
                              num_candidates=64, max_detections=16)
    dets = predict(x)
    assert dets.boxes.shape == (BATCH, 16, 4)
    assert dets.scores.shape == (BATCH, 16)
    # same pipeline as the eval driver: recompute directly
    from mm_distillnet_tpu.ops.anchors import anchor_table
    from mm_distillnet_tpu.ops.postprocess import (class_validity_table,
                                                   postprocess_detections)
    out = model.apply(variables, x, train=False)
    want = postprocess_detections(
        out.classification, out.regression,
        jnp.asarray(anchor_table(SIZE)),
        jnp.asarray(class_validity_table(20, [6])), image_size=SIZE,
        num_candidates=64, max_detections=16)
    np.testing.assert_allclose(np.asarray(dets.boxes),
                               np.asarray(want.boxes), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dets.valid),
                                  np.asarray(want.valid))


def test_export_roundtrip(tmp_path):
    """Serialized artifact must reproduce the live predictor bit-for-bit
    (weights are baked constants; same XLA program)."""
    model, variables, x = _build()
    predict = make_serving_fn(model, variables, SIZE,
                              num_candidates=64, max_detections=16)
    path = os.path.join(tmp_path, 'predictor.stablehlo')
    export_predictor(predict, BATCH, SIZE, 8, path)
    assert os.path.getsize(path) > 0
    loaded = load_predictor(path)
    want = predict(x)
    got = loaded(x)
    for f in want._fields:
        np.testing.assert_allclose(np.asarray(getattr(got, f)),
                                   np.asarray(getattr(want, f)), atol=1e-6)


def test_serve_many_pads_and_chunks():
    """5 images through a batch-2 program: 3 chunks, tail padded; rows
    must equal per-image direct prediction (padding never leaks)."""
    model, variables, _ = _build()
    predict = make_serving_fn(model, variables, SIZE,
                              num_candidates=64, max_detections=16)
    images = np.asarray(jax.random.normal(jax.random.PRNGKey(7),
                                          (5, SIZE, SIZE, 8)))
    got = serve_many(predict, images, BATCH)
    assert got.boxes.shape == (5, 16, 4)
    # chunk [4] was padded with a zero image; row 4 must match running
    # image 4 in a full batch alongside a real image
    ref = predict(jnp.asarray(np.stack([images[4], images[0]])))
    np.testing.assert_allclose(got.boxes[4], np.asarray(ref.boxes[0]),
                               atol=1e-5)
    np.testing.assert_allclose(got.scores[4], np.asarray(ref.scores[0]),
                               atol=1e-6)


def test_cross_platform_tpu_export_from_cpu(tmp_path):
    """platforms=('tpu',) must lower from a CPU host (ship artifacts to a
    serving fleet without a chip attached to the build machine)."""
    model, variables, _ = _build()
    predict = make_serving_fn(model, variables, SIZE,
                              num_candidates=64, max_detections=16)
    path = os.path.join(tmp_path, 'predictor_tpu.stablehlo')
    export_predictor(predict, BATCH, SIZE, 8, path, platforms=('tpu',))
    assert os.path.getsize(path) > 0


def test_sharded_serving_matches_single_device():
    """mesh-sharded predictor (batch over 8 virtual devices) must produce
    the single-device results — batch-parallel inference is pure SPMD."""
    from mm_distillnet_tpu.parallel.mesh import create_mesh
    model, variables, _ = _build()
    mesh = create_mesh()
    batch = 8
    images = jax.random.normal(jax.random.PRNGKey(3),
                               (batch, SIZE, SIZE, 8))
    single = make_serving_fn(model, variables, SIZE,
                             num_candidates=64, max_detections=16)
    sharded = make_serving_fn(model, variables, SIZE,
                              num_candidates=64, max_detections=16,
                              mesh=mesh)
    want = single(images)
    got = sharded(images)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    np.testing.assert_allclose(np.asarray(got.boxes),
                               np.asarray(want.boxes), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), atol=1e-6)
