"""PyTorch .pth -> flax variables converter for EfficientDet checkpoints.

One-time bridge for the reference's shipped teacher/student checkpoints
(reference src/utils/utils.py:441-590 model registry; checkpoint format is a
torch state_dict, sometimes nested under 'state_dict'/'model' and prefixed
with 'module.'/'student_model.' by DataParallel wrappers — the prefix
cleanup mirrors filter_model_dict, src/utils/utils.py:327-411).

The key translation is derived mechanically from our flax module tree so it
can never drift from the model definition: every flax parameter path maps to
exactly one torch key; unmapped torch keys are reported.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def strip_wrapper_prefixes(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap checkpoint containers and strip parallel-wrapper prefixes."""
    for key in ('state_dict', 'model', 'model_state_dict'):
        if key in state_dict and isinstance(state_dict[key], dict):
            state_dict = state_dict[key]
    out = {}
    for k, v in state_dict.items():
        for prefix in ('module.', 'student_model.', 'model.module.'):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    return out


def _torch_key_for(path: Tuple[str, ...], collection: str) -> str:
    """Translate a flax variable path to the reference torch key."""
    parts = list(path)
    leaf = parts.pop()
    if collection == 'params':
        leaf_map = {'kernel': 'weight', 'bias': 'bias',
                    'scale': 'weight'}
    else:
        leaf_map = {'mean': 'running_mean', 'var': 'running_var'}
    # fast-attention weights are bare parameters named p*_w*
    if re.fullmatch(r'p\d_w\d', leaf):
        segs = _module_path(parts)
        return '.'.join(segs + [leaf])
    tleaf = leaf_map[leaf]
    segs = _module_path(parts)
    return '.'.join(segs) + '.' + tleaf


def _module_path(parts: List[str]) -> List[str]:
    segs: List[str] = []
    i = 0
    root = parts[0] if parts else ''
    while i < len(parts):
        p = parts[i]
        if p == 'backbone_net':
            segs += ['backbone_net', 'model']
        elif m := re.fullmatch(r'backbone_net_(\w+)', p):
            # generator per-modality backbone (reference
            # YetAnotherEfficientDet_generator.py:634-641)
            segs += ['model_backbones', m.group(1), 'model']
        elif m := re.fullmatch(r'bifpn_(\w+)', p):
            segs += ['model_necks', m.group(1)]
        elif m := re.fullmatch(r'_blocks_(\d+)', p):
            segs += ['_blocks', m.group(1)]
        elif m := re.fullmatch(r'cell_(\d+)', p):
            segs.append(m.group(1))
        elif p == 'tower':
            pass  # flax-only grouping level
        elif m := re.fullmatch(r'conv_(\d+)_depthwise', p):
            segs += ['conv_list', m.group(1), 'depthwise_conv', 'conv']
        elif m := re.fullmatch(r'conv_(\d+)_pointwise', p):
            segs += ['conv_list', m.group(1), 'pointwise_conv', 'conv']
        elif p == 'header_depthwise':
            segs += ['header', 'depthwise_conv', 'conv']
        elif p == 'header_pointwise':
            segs += ['header', 'pointwise_conv', 'conv']
        elif m := re.fullmatch(r'bn_(\d+)_(\d+)', p):
            segs += ['bn_list', m.group(1), m.group(2)]
        elif p in ('p3_down_channel', 'p4_down_channel', 'p5_down_channel',
                   'p4_down_channel_2', 'p5_down_channel_2', 'p5_to_p6'):
            # Sequential(conv, bn[, pool]) in torch: conv -> .0, bn -> .1
            nxt = parts[i + 1]
            segs += [p, '0' if nxt == 'conv' else '1']
            if nxt == 'bn':
                i += 1  # consumed
            else:
                segs += ['conv']
                i += 1
        elif p == 'depthwise_conv':
            segs += ['depthwise_conv', 'conv']
        elif p == 'pointwise_conv':
            segs += ['pointwise_conv', 'conv']
        elif p == 'conv':  # ConvSame wrapper
            segs += ['conv']
        elif p == 'bn':
            segs += ['bn']
        elif re.fullmatch(r'_conv_stem|_expand_conv|_depthwise_conv|'
                          r'_se_reduce|_se_expand|_project_conv', p):
            segs += [p, 'conv']
        elif re.fullmatch(r'_bn\d', p):
            segs += [p]
        else:
            segs.append(p)
        i += 1
    return segs


_MODALITIES = ('audio', 'thermal', 'depth', 'rgb')


def _alternate_keys(tkey: str) -> List[str]:
    """Cross-format fallbacks mirroring the reference's filter_model_dict
    prefix remapping (utils.py:342-357): load a plain-EfficientDet
    checkpoint into generator per-modality slots, or a generator
    checkpoint's modality slots into a plain model."""
    alts = []
    if tkey.startswith('model_backbones.'):
        alts.append(re.sub(r'^model_backbones\.\w+\.', 'backbone_net.',
                           tkey))
    elif tkey.startswith('model_necks.'):
        alts.append(re.sub(r'^model_necks\.\w+\.', 'bifpn.', tkey))
    elif tkey.startswith('backbone_net.'):
        alts += [tkey.replace('backbone_net.', f'model_backbones.{m}.', 1)
                 for m in _MODALITIES]
    elif tkey.startswith('bifpn.'):
        alts += [tkey.replace('bifpn.', f'model_necks.{m}.', 1)
                 for m in _MODALITIES]
    return alts


def _to_flax_tensor(torch_tensor, flax_shape) -> np.ndarray:
    arr = np.asarray(torch_tensor.detach().cpu().numpy()
                     if hasattr(torch_tensor, 'detach') else torch_tensor)
    if arr.ndim == 4:  # conv OIHW -> HWIO
        arr = arr.transpose(2, 3, 1, 0)
    if tuple(arr.shape) != tuple(flax_shape):
        raise ValueError(f'shape mismatch: torch {arr.shape} vs flax '
                         f'{tuple(flax_shape)}')
    return arr


def convert_state_dict(state_dict: Dict[str, Any], flax_variables,
                       strict: bool = True):
    """Fill a flax variables tree (from model.init) with torch weights.

    Returns (variables, report) where report lists unused torch keys and
    unmatched flax paths.
    """
    import jax

    sd = strip_wrapper_prefixes(state_dict)
    used = set()
    missing = []

    def fill(collection: str, tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, leaf in flat:
            keys = tuple(getattr(p, 'key', getattr(p, 'name', str(p)))
                         for p in path)
            tkey = _torch_key_for(keys, collection)
            # size-mismatched keys are skipped like the reference's
            # filter_model_dict (it only copies on v.size() equality) —
            # e.g. generator heads are wider than plain-model heads
            match = next(
                (a for a in [tkey] + _alternate_keys(tkey)
                 if a in sd and np.asarray(sd[a]).size == leaf.size), None)
            if match is not None:
                used.add(match)
                val = _to_flax_tensor(sd[match], leaf.shape)
            else:
                missing.append((collection,) + keys)
                val = np.asarray(leaf)
            out[keys] = val
        return out

    filled = {}
    for coll in flax_variables:
        flat_vals = fill(coll, flax_variables[coll])
        treedef = jax.tree_util.tree_structure(flax_variables[coll])
        leaves = jax.tree_util.tree_flatten_with_path(
            flax_variables[coll])[0]
        ordered = [flat_vals[tuple(getattr(p, 'key', getattr(p, 'name',
                                                             str(p)))
                                   for p in path)]
                   for path, _ in leaves]
        filled[coll] = jax.tree_util.tree_unflatten(treedef, ordered)

    unused = [k for k in sd
              if k not in used and not k.startswith(('anchors.',))
              and 'num_batches_tracked' not in k
              and not k.startswith(('_conv_head', '_bn1.', '_fc',
                                    'backbone_net.model._conv_head',
                                    'backbone_net.model._bn1.',
                                    'backbone_net.model._fc'))]
    report = {'missing': missing, 'unused': unused}
    if strict and missing:
        raise ValueError(f'unmatched flax paths: {missing[:10]} '
                         f'({len(missing)} total)')
    return filled, report


def load_torch_checkpoint(path: str, flax_variables, strict: bool = True):
    """torch.load a .pth and convert (CPU-only; torch is a conversion-time
    dependency, never on the TPU compute path)."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    return convert_state_dict(sd, flax_variables, strict=strict)


# ---------------------------------------------------------------------------
# ImageNet-pretrained backbone bootstrap (model-zoo layout)
# ---------------------------------------------------------------------------

# Conv submodules of the lukemelas EfficientNet zoo layout. In the zoo
# checkpoints Conv2dStaticSamePadding SUBCLASSES nn.Conv2d, so keys are
# e.g. '_conv_stem.weight'; the reference's variant WRAPS a conv ('.conv.
# weight', see Conv2dStaticSamePadding at reference
# src/YetAnotherEfficientNet.py:27-65) — the adapter inserts the '.conv'
# level and the 'backbone_net.model.' prefix to reach our canonical keys.
_ZOO_CONV_MODULES = ('_conv_stem', '_expand_conv', '_depthwise_conv',
                     '_se_reduce', '_se_expand', '_project_conv',
                     '_conv_head')


def _is_zoo_layout(sd: Dict[str, Any]) -> bool:
    return any(k.startswith(('_conv_stem.', '_blocks.')) for k in sd)


def _zoo_to_reference_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        for conv in _ZOO_CONV_MODULES:
            for leaf in ('.weight', '.bias'):
                suffix = conv + leaf
                if k.endswith(suffix):
                    k = k[: -len(leaf)] + '.conv' + leaf
                    break
        out['backbone_net.model.' + k] = v
    return out


def bootstrap_backbone_from_zoo(state_dict: Dict[str, Any], flax_variables,
                                strict: bool = True):
    """Initialize ONLY the backbone of a flax EfficientDet variables tree
    from a stock model-zoo EfficientNet checkpoint (ImageNet weights).

    Reproduces the reference's `from_pretrained` bootstrap (reference
    src/YetAnotherEfficientNet.py:596-604): every backbone weight loads from
    the zoo, EXCEPT the stem conv when the model's input channel count
    differs from the checkpoint's (1- or 8-channel stems keep their random
    init — the reference rebuilds the stem conv after loading). BiFPN and
    heads always stay at their init (the zoo has no detector weights).

    Accepts the lukemelas zoo layout ('_conv_stem.weight', '_blocks.N....')
    or an already reference-shaped backbone state_dict. Returns
    (variables, report); with strict=True raises if any non-stem backbone
    parameter failed to load.
    """
    import jax

    sd = strip_wrapper_prefixes(state_dict)
    if _is_zoo_layout(sd):
        sd = _zoo_to_reference_keys(sd)

    # stem-swap rule: drop the zoo stem when channel counts mismatch
    stem_key = 'backbone_net.model._conv_stem.conv.weight'
    flax_stem = (flax_variables.get('params', {})
                 .get('backbone_net', {})
                 .get('_conv_stem', {}).get('kernel'))
    stem_swapped = False
    if stem_key in sd and flax_stem is not None:
        zoo_in = np.asarray(sd[stem_key]).shape[1]  # OIHW
        if zoo_in != flax_stem.shape[2]:            # HWIO
            del sd[stem_key]
            stem_swapped = True

    variables, report = convert_state_dict(sd, flax_variables, strict=False)
    report['stem_swapped'] = stem_swapped

    # the bootstrap contract: every backbone param (except a swapped stem)
    # must have loaded; everything else is EXPECTED missing
    bad = [p for p in report['missing']
           if p[1] == 'backbone_net'
           and not (stem_swapped and '_conv_stem' in p)]
    report['backbone_missing'] = bad
    if strict and bad:
        raise ValueError(f'pretrained backbone bootstrap failed to map '
                         f'{len(bad)} backbone params: {bad[:8]}')
    return variables, report


def load_zoo_backbone(path: str, flax_variables, strict: bool = True):
    """torch.load a model-zoo EfficientNet .pth and bootstrap the backbone."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    return bootstrap_backbone_from_zoo(sd, flax_variables, strict=strict)
