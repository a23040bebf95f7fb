"""Debug: why does a supervised-overfit detector evaluate at AP 0?

Trains D0 on 4 synthetic frames (GT labels), then compares train-mode vs
eval-mode forward scores and the evaluator's AP.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get('MMDT_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['MMDT_PLATFORM'])
import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/mmdt_xla'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import jax.numpy as jnp
import numpy as np

from mm_distillnet_tpu.config import default_config
from mm_distillnet_tpu.data.loader import collate
from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
from mm_distillnet_tpu.models.efficientdet import EfficientDet
from mm_distillnet_tpu.train.trainer import train

SIZE = 128
EPOCHS = int(os.environ.get('DBG_EPOCHS', '80'))

config = default_config(
    image_size=SIZE, synthetic_size=4, batch_size=4, num_workers=1,
    num_epoches=EPOCHS, val_interval=10**6, es_patience=10**6,
    optimizer='Adam', lr=1e-3, scheduler='StepLR', step_size=10**6,
    gamma=1.0, max_gt=16, nms_candidates=128, max_det_per_teacher=16,
    max_detections=32, conf_threshold=0.3, use_labels=True,
    student_input='rgb', kd_loss='None', train_method='traditional',
    compute_dtype='float32', rank=0, fast_run=False, resume=False,
    use_rgb=True, use_thermal=False, use_depth=False,
    exp_name='dbg-supervised')

ds = SyntheticMultimodal(config, 'train')
model = EfficientDet(num_classes=20, compound_coef=0, dtype=jnp.float32)
v0 = jax.jit(model.init)(jax.random.PRNGKey(1),
                         jnp.zeros((1, SIZE, SIZE, 3)))
state = train({}, (model, v0), config, ds, None)
variables = {'params': state.params, 'batch_stats': state.batch_stats}

batch = collate([ds[i] for i in range(4)], max_gt=16)
x = jnp.asarray(batch['rgb'])

out_eval = model.apply(variables, x, train=False)
out_train, _ = model.apply(variables, x, train=True,
                           mutable=['batch_stats'],
                           rngs={'dropout': jax.random.PRNGKey(0)})

for name, out in (('eval', out_eval), ('train', out_train)):
    cls = np.asarray(out.classification)
    print(f'{name}: max score per image = '
          f'{[round(float(cls[i].max()), 4) for i in range(4)]}; '
          f'anchors>0.3 = {[int((cls[i].max(-1) > 0.3).sum()) for i in range(4)]}')

# what the evaluator reports
from mm_distillnet_tpu.evaluation import evaluate
config['use_labels'] = 'True'
ap = evaluate({'rgb': (model, variables)}, (model, variables), ds, config)
print('AP table:')
print(ap[['modality', 'AP@Ave', 'AP@0.5']])
print('GT boxes of frame 0:', ds.get_annotations(ds.ids[0]))
