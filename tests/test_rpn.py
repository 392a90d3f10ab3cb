import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.models import rpn as R
from instance_nerf_tpu.models.backbones import VGG_FPN


def test_anchor_counts():
    gen = R.AnchorGenerator3D()
    # ratios {111,112,122,113,133}: unique perms 1+3+3+3+3 = 13 per size
    assert gen.num_anchors_per_location() == [13, 13, 13, 13]


def test_base_anchors_symmetric():
    gen = R.AnchorGenerator3D()
    base = gen.base_anchors(0)
    assert base.shape == (13, 6)
    np.testing.assert_allclose(base[:, :3], -base[:, 3:])
    # the cube anchor at size 8 is +-4
    assert any(np.allclose(b, [-4, -4, -4, 4, 4, 4]) for b in base)


def test_grid_anchors_layout():
    gen = R.AnchorGenerator3D(sizes=((8.0,),), aspect_ratios=(((1.0, 1.0, 1.0),),))
    anchors = gen.grid_anchors([(2, 2, 2)], [(4, 4, 4)])[0]
    assert anchors.shape == (8, 6)
    # first anchor at shift (0,0,0), second at (0,0,4)
    np.testing.assert_allclose(anchors[0], [-4, -4, -4, 4, 4, 4])
    np.testing.assert_allclose(anchors[1], [-4, -4, 0, 4, 4, 8])


def test_assign_targets():
    anchors = jnp.asarray(
        [[0, 0, 0, 10, 10, 10], [20, 20, 20, 30, 30, 30], [50, 50, 50, 52, 52, 52.0]]
    )
    gt = jnp.asarray([[0, 0, 0, 10, 10, 10.0], [0, 0, 0, 0, 0, 0]])
    gt_mask = jnp.asarray([True, False])
    t = R.assign_targets_to_anchors(anchors, gt, gt_mask, 0.7, 0.3)
    labels = np.asarray(t.labels)
    assert labels[0] == 1.0  # exact match
    assert labels[1] == 0.0 and labels[2] == 0.0
    np.testing.assert_allclose(np.asarray(t.matched_gt[0]), [0, 0, 0, 10, 10, 10])


def test_assign_targets_no_gt():
    anchors = jnp.asarray([[0, 0, 0, 10, 10, 10.0]])
    gt = jnp.zeros((2, 6))
    t = R.assign_targets_to_anchors(anchors, gt, jnp.zeros(2, bool), 0.7, 0.3)
    assert float(t.labels[0]) == 0.0  # all background


def test_anchor_padding_mask():
    gen = R.AnchorGenerator3D(sizes=((8.0,),), aspect_ratios=(((1.0, 1.0, 1.0),),))
    anchors = [jnp.asarray(a) for a in gen.grid_anchors([(4, 4, 4)], [(4, 4, 4)])]
    sizes = jnp.asarray([[16.0, 16, 16], [8.0, 8, 8]])
    m = np.asarray(R.anchor_padding_mask(anchors, sizes, [4]))
    assert m.shape == (2, 64)
    assert m[0].all()  # full grid valid
    assert m[1].sum() == 8  # 2x2x2 cells valid


def test_rpn_loss_runs():
    rng = np.random.default_rng(0)
    gen = R.AnchorGenerator3D(sizes=((8.0,), (16.0,)),
                              aspect_ratios=(((1.0, 1.0, 1.0),),) * 2)
    anchors_l = gen.grid_anchors([(4, 4, 4), (2, 2, 2)], [(8,) * 3, (16,) * 3])
    anchors = jnp.asarray(np.concatenate(anchors_l))
    r = anchors.shape[0]
    obj = jnp.asarray(rng.normal(size=(2, r)), jnp.float32)
    deltas = jnp.asarray(rng.normal(size=(2, r, 6)) * 0.1, jnp.float32)
    gt = jnp.asarray([[[4, 4, 4, 12, 12, 12]], [[8, 8, 8, 24, 24, 24.0]]], jnp.float32)
    gm = jnp.ones((2, 1), bool)
    losses = R.rpn_loss(jax.random.key(0), obj, deltas, anchors, gt, gm,
                        batch_size_per_mesh=32, max_mesh_dim=32)
    for k in ("loss_objectness", "loss_rpn_box_reg", "loss_rpn_box_reg_2d"):
        assert np.isfinite(float(losses[k])), k


def test_filter_proposals_recovers_gt():
    # perfect deltas on one anchor level -> proposals = decoded gt
    gen = R.AnchorGenerator3D(sizes=((8.0,),), aspect_ratios=(((1.0, 1.0, 1.0),),))
    anchors_l = [jnp.asarray(a) for a in gen.grid_anchors([(4, 4, 4)], [(8,) * 3])]
    anchors = anchors_l[0]
    gt = jnp.asarray([6.0, 6, 6, 14, 14, 14])
    from instance_nerf_tpu.ops.coders import AABBCoder

    coder = AABBCoder()
    deltas = coder.encode(jnp.broadcast_to(gt, (64, 6)), anchors)
    # score the anchor nearest gt center highest
    centers = 0.5 * (anchors[:, :3] + anchors[:, 3:])
    d = jnp.linalg.norm(centers - 10.0, axis=-1)
    obj = -d[None]
    props = R.filter_proposals(
        obj, deltas[None], anchors_l, jnp.asarray([[32.0, 32, 32]]),
        pre_nms_top_n=16, post_nms_top_n=4, nms_thresh=0.5,
    )
    assert bool(props.valid[0, 0])
    np.testing.assert_allclose(np.asarray(props.boxes[0, 0]), np.asarray(gt), atol=1e-3)
    # all duplicates collapse to one proposal under NMS
    assert int(props.valid[0].sum()) == 1


def test_nerf_rpn_end_to_end():
    model = R.NeRFRegionProposalNetwork(backbone=VGG_FPN(cfg="AF", input_size=160))
    grids = jnp.ones((1, 32, 32, 32, 4))
    params = model.init(jax.random.key(0), grids)
    obj, reg, anchors, feats = model.apply(params, grids)
    r_total = sum(a.shape[0] for a in anchors)
    assert obj.shape == (1, r_total)
    assert reg.shape == (1, r_total, 6)
    assert anchors[0].shape[0] == 8**3 * 13
