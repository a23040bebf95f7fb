"""The roofline analysis (scripts/roofline.py) must keep walking the model's
jaxpr correctly: all three conv kinds present, totals positive, and the
depthwise FLOP share tiny while its byte share is large — the structural
fact the whole analysis exists to document (BENCH_NOTES.md round 3)."""
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'scripts'))


def test_roofline_conv_walk():
    from roofline import walk
    from mm_distillnet_tpu.models.efficientdet import EfficientDet

    model = EfficientDet(num_classes=20, compound_coef=0,
                         dtype=jnp.bfloat16)
    x = jnp.zeros((1, 256, 256, 8), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    jaxpr = jax.make_jaxpr(
        lambda v, x: model.apply(v, x, train=False))(variables, x)
    stats = []
    walk(jaxpr.jaxpr, stats)

    kinds = {k for _, _, k in stats}
    assert kinds == {'depthwise', 'pointwise', 'spatial'}
    fl = {k: sum(f for f, _, kk in stats if kk == k) for k in kinds}
    by = {k: sum(b for _, b, kk in stats if kk == k) for k in kinds}
    assert all(v > 0 for v in fl.values())
    # depthwise: negligible FLOPs, non-negligible bytes (VPU-bound)
    assert fl['depthwise'] < 0.2 * fl['pointwise']
    assert by['depthwise'] > 0.3 * by['pointwise']
    # the 3x3 stem is the single 'spatial' conv
    assert sum(1 for _, _, k in stats if k == 'spatial') == 1
