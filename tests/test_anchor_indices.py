"""anchors_from_indices must match the anchor table exactly."""
import jax.numpy as jnp
import numpy as np

from mm_distillnet_tpu.ops.anchors import (anchor_table,
                                           anchors_from_indices, num_anchors)


def test_anchors_from_indices_matches_table():
    for size in (128, 768):
        table = anchor_table(size)
        n = num_anchors(size)
        rng = np.random.default_rng(0)
        idx = np.concatenate([[0, 1, 8, 9, n - 1],
                              rng.integers(0, n, 200)]).astype(np.int32)
        got = np.asarray(anchors_from_indices(jnp.asarray(idx), size))
        np.testing.assert_allclose(got, table[idx], rtol=1e-6, atol=1e-3)


def test_fast_and_exact_postprocess_agree():
    import jax
    from mm_distillnet_tpu.ops.postprocess import (postprocess_detections,
                                                   class_validity_table)
    size = 128
    table = anchor_table(size)
    n, c = table.shape[0], 20
    rng = np.random.default_rng(1)
    cls = rng.uniform(0.0, 1.0, (2, n, c)).astype(np.float32)
    reg = rng.normal(scale=0.1, size=(2, n, 4)).astype(np.float32)
    cv = jnp.asarray(class_validity_table(c, [3, 6, 9]))
    kw = dict(image_size=size, conf_threshold=0.3, nms_threshold=0.5,
              num_candidates=64, max_detections=16)
    fastd = postprocess_detections(jnp.asarray(cls), jnp.asarray(reg),
                                   jnp.asarray(table), cv, fast=True, **kw)
    exact = postprocess_detections(jnp.asarray(cls), jnp.asarray(reg),
                                   jnp.asarray(table), cv, fast=False, **kw)
    np.testing.assert_array_equal(np.asarray(fastd.valid),
                                  np.asarray(exact.valid))
    np.testing.assert_array_equal(np.asarray(fastd.classes),
                                  np.asarray(exact.classes))
    np.testing.assert_allclose(np.asarray(fastd.boxes),
                               np.asarray(exact.boxes), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fastd.scores),
                               np.asarray(exact.scores), atol=1e-6)
