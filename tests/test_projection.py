"""2D projection auxiliary loss tests."""

import jax.numpy as jnp
import numpy as np

from nerf_mae_tpu.ops.projection import (
    get_w2cs,
    project_points,
    projection_2d_loss,
)


def test_w2cs_look_at_centroid():
    w2cs = get_w2cs(160)
    assert w2cs.shape == (4, 4, 4)
    # the scene centroid projects to the image center of every view
    centroid = jnp.array([[80.0, 80.0, 80.0]])
    for v in range(4):
        pix = np.asarray(project_points(centroid, jnp.asarray(w2cs[v])))
        np.testing.assert_allclose(pix, [[320.0, 240.0]], atol=1e-2)


def test_identical_boxes_zero_loss():
    boxes = jnp.array([[40.0, 50.0, 60.0, 20.0, 10.0, 8.0, 0.4]])
    w = jnp.array([1.0])
    loss = projection_2d_loss(boxes, boxes, w, 160)
    assert float(loss) == 0.0


def test_displaced_box_positive_loss():
    b1 = jnp.array([[40.0, 50.0, 60.0, 20.0, 10.0, 8.0, 0.4]])
    b2 = b1.at[:, 0].add(10.0)
    loss = projection_2d_loss(b1, b2, jnp.array([1.0]), 160)
    assert float(loss) > 0

    # weight 0 masks the contribution entirely
    loss0 = projection_2d_loss(b1, b2, jnp.array([0.0]), 160)
    assert float(loss0) == 0.0


def test_aabb_variant():
    b1 = jnp.array([[10.0, 10, 10, 30, 30, 30]])
    b2 = jnp.array([[12.0, 10, 10, 32, 30, 30]])
    loss = projection_2d_loss(b1, b2, jnp.array([1.0]), 160)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_rpn_with_proj2d_weight():
    import jax

    from nerf_mae_tpu.config import SwinConfig, TrainConfig
    from nerf_mae_tpu.models.rpn import RPNConfig
    from nerf_mae_tpu.parallel import make_mesh
    from nerf_mae_tpu.train.rpn_trainer import RPNTrainer
    from nerf_mae_tpu.data.datasets import (
        detection_batch_iterator,
        synthetic_detection_scenes,
    )

    swin = SwinConfig(embed_dim=12, depths=(1, 1, 1, 1),
                      num_heads=(3, 6, 12, 24), stochastic_depth_prob=0.0)
    rpn = RPNConfig(resolution=32, pre_nms_top_n=64, post_nms_top_n=32,
                    max_gt=8, batch_size_per_mesh=64, proj2d_loss_weight=0.1)
    trainer = RPNTrainer(swin, rpn, TrainConfig(batch_size=2), 10,
                         make_mesh(1), compute_dtype="float32", remat=False)
    state = trainer.init(jax.random.PRNGKey(0))
    scenes = synthetic_detection_scenes(2, 32, seed=0, min_size=24)

    class _DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return scenes[i]

    batch = next(detection_batch_iterator(_DS(), 2, 32, max_gt=8,
                                          shuffle=False, loop=False))
    state, m = trainer.train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert "loss_reg_2d" in m and np.isfinite(float(m["loss_reg_2d"]))
