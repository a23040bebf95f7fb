"""int8 post-training quantization (mm_distillnet_tpu/quant.py).

The quantized conv math is checked EXACTLY against a numpy re-derivation
(same rounding, same scales); the model-level path is checked for policy
selection and closeness to the fp forward. AP preservation on trained
weights is exercised by the opt-in serving bench (scripts/bench_serving.py
--quant) — random-init detection outputs carry no signal.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mm_distillnet_tpu import quant

from .helpers import fast_init


class _OneConv(nn.Module):
    features: int = 8
    stride: int = 2
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                       padding='SAME', feature_group_count=self.groups,
                       use_bias=self.use_bias, param_dtype=jnp.float32,
                       name='conv')(x)


def _pack_for(model, v, x, policy=quant.QuantPolicy()):
    return quant.build_quant_pack(model, v, jnp.asarray(x), [x], policy)


@pytest.mark.parametrize('groups,features,bias', [(1, 8, True), (4, 4, False)])
def test_quantized_conv_matches_numpy_int8_math(groups, features, bias):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    model = _OneConv(features=features, groups=groups, use_bias=bias)
    v = model.init(jax.random.PRNGKey(1), jnp.asarray(x))

    pack = _pack_for(model, v, x)
    assert list(pack.qkernels) == ['conv']
    got = np.asarray(quant.quantized_apply(
        model, v, pack, jnp.asarray(x), compute_dtype=jnp.float32))

    # numpy re-derivation of the same static symmetric scheme
    sx = float(pack.ascales['conv'])
    qx = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    qw = np.asarray(pack.qkernels['conv'], dtype=np.int32)
    sw = np.asarray(pack.wscales['conv'])
    acc = np.zeros(got.shape, np.int64)
    # TF SAME for size 9 / stride 2 / k 3: extra = (ceil(9/2)-1)*2-9+3 = 2
    # -> pad (1, 1); padded row of output i, tap di is 2i + di.
    xp = np.pad(qx, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cin_g = 4 // groups
    for o in range(features):
        g = o // (features // groups)
        for i in range(got.shape[1]):
            for j in range(got.shape[2]):
                patch = xp[:, 2 * i:2 * i + 3, 2 * j:2 * j + 3,
                           g * cin_g:(g + 1) * cin_g]
                acc[:, i, j, o] = np.sum(
                    patch * qw[None, :, :, :, o], axis=(1, 2, 3))
    want = acc.astype(np.float32) * (sx * sw)
    if bias:
        want = want + np.asarray(v['params']['conv']['bias'])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_policy_skips_se_and_header_and_depthwise_switch():
    from mm_distillnet_tpu.models.efficientnet import BlockArgs, MBConvBlock
    args = BlockArgs(3, 1, 8, 8, 6, 1)
    model = MBConvBlock(args, dtype=jnp.float32)
    x = np.random.RandomState(0).randn(1, 16, 16, 8).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    specs = quant.collect_conv_specs(model, v, jnp.asarray(x))
    assert set(specs) == {'_expand_conv', '_depthwise_conv', '_project_conv'}
    assert specs['_depthwise_conv']['feature_group_count'] == 48

    no_dw = quant.collect_conv_specs(
        model, v, jnp.asarray(x),
        quant.QuantPolicy(quantize_depthwise=False))
    assert set(no_dw) == {'_expand_conv', '_project_conv'}

    assert not quant.QuantPolicy().wants('tower/header_pointwise', 1)
    assert not quant.QuantPolicy().wants('_blocks_3/_se_reduce', 1)


def test_backbone_quantized_close_to_fp():
    """EfficientNetFeatures tiny @64: the full MBConv stack (expand/dw/SE/
    project, swish, BN, skips) under int8 convs stays close to fp."""
    from mm_distillnet_tpu.models.efficientnet import EfficientNetFeatures
    model = EfficientNetFeatures(compound_coef=-1, dtype=jnp.float32)
    x = (np.random.RandomState(0).rand(2, 64, 64, 3) * 2 - 1
         ).astype(np.float32)
    v = fast_init(model, 0, jnp.asarray(x), train=False)

    pack = _pack_for(model, v, x)
    assert len(pack.qkernels) > 12
    fp = model.apply(v, jnp.asarray(x), train=False)
    q = quant.quantized_apply(model, v, pack, jnp.asarray(x), train=False,
                              compute_dtype=jnp.float32)
    for a, b in zip(fp, q):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).mean() + 1e-8
        rel = np.abs(a - b).mean() / denom
        assert rel < 0.12, rel
    # and it is genuinely the int8 path, not a passthrough (deep levels
    # decay to ~1e-7 magnitude at random init, so check the first tap)
    assert not np.array_equal(np.asarray(fp[0]), np.asarray(q[0]))


def test_unpacked_convs_fall_through():
    """A conv missing from the pack runs the fp path (policy-skipped or
    newly added modules keep working)."""
    model = _OneConv()
    x = np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    empty = quant.QuantPack({}, {}, {})
    got = quant.quantized_apply(model, v, empty, jnp.asarray(x),
                                compute_dtype=jnp.float32)
    want = model.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_serving_fn_quantized_end_to_end():
    """make_serving_fn(quant_pack=...) returns valid Detections and differs
    from the fp predictor only within quantization error."""
    from mm_distillnet_tpu.models.efficientdet import EfficientDet
    from mm_distillnet_tpu.serving import make_serving_fn
    model = EfficientDet(num_classes=4, compound_coef=-1, dtype=jnp.float32)
    x = (np.random.RandomState(1).rand(1, 128, 128, 3)).astype(np.float32)
    v = fast_init(model, 0, jnp.asarray(x), train=False)
    pack = _pack_for(model, v, x)

    fp_fn = make_serving_fn(model, v, 128, num_classes=4,
                            valid_prediction_ids=[0, 1, 2, 3],
                            num_candidates=64, max_detections=16)
    q_fn = make_serving_fn(model, v, 128, num_classes=4,
                           valid_prediction_ids=[0, 1, 2, 3],
                           num_candidates=64, max_detections=16,
                           quant_pack=pack)
    fp_det, q_det = fp_fn(jnp.asarray(x)), q_fn(jnp.asarray(x))
    assert q_det.boxes.shape == fp_det.boxes.shape
    assert bool(jnp.all(jnp.isfinite(q_det.scores)))
    # scores live on the sigmoid scale (selection-level comparison is
    # meaningless at random init: near-threshold NMS picks flip freely;
    # AP preservation on trained weights is the bench's job)
    assert float(q_det.scores.max()) <= 1.0
    assert float(q_det.scores.min()) >= 0.0
