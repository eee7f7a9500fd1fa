"""Det-suite inference path: jitted images -> 3D detections."""

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.det import test as dtest
from test_det_train import tiny_cfg, tiny_model, make_batch, H, W


def test_det_inference_end_to_end():
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch.img, (H, W))

    infer = jax.jit(dtest.make_inference_fn(
        model, cfg, max_obj_per_img=8, min_fcos_score=0.0))
    results = infer(variables, batch.img, batch.cam_intrinsic,
                    batch.img_shapes, batch.ori_shapes, batch.img_flips,
                    batch.img_dense_x2d, batch.img_dense_x2d_mask,
                    jax.random.PRNGKey(2))
    k = 8 * batch.img.shape[0]
    assert results.bbox_3d.shape == (k, 7)
    assert results.bbox_2d.shape == (k, 4)
    assert results.valid.shape == (k,)
    for name in ('bbox_3d', 'bbox_2d', 'scores', 'scores_3d'):
        v = np.asarray(getattr(results, name))
        assert np.all(np.isfinite(v[np.asarray(results.valid)])), name

    out2d, out3d = dtest.results_to_numpy(results, 2, cfg.num_classes)
    assert len(out3d) == 2 and len(out3d[0]) == cfg.num_classes
    total = sum(arr.shape[0] for img in out3d for arr in img)
    assert total == int(np.asarray(results.valid).sum())
    # columns: 7 box + 1 score + 2 velo + 1 attr
    for img in out3d:
        for arr in img:
            assert arr.shape[1] == 11
