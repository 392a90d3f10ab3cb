import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.models.backbones import (
    ResNet_FPN_64,
    ResNet_FPN_256,
    ResNetSimplified,
    VGG_FPN,
    build_backbone,
)


def _init_and_run(model, shape=(1, 32, 32, 32, 4)):
    x = jnp.ones(shape)
    params = model.init(jax.random.key(0), x)
    return model.apply(params, x)


def test_vgg_fpn_pyramid_shapes():
    # input_size=160 engages the stride-4 stem -> strides {4,8,16,32}
    out = _init_and_run(VGG_FPN(cfg="AF", input_size=160))
    assert len(out) == 4
    shapes = [o.shape for o in out]
    assert shapes[0] == (1, 8, 8, 8, 256)
    assert shapes[1] == (1, 4, 4, 4, 256)
    assert shapes[2] == (1, 2, 2, 2, 256)
    assert shapes[3] == (1, 1, 1, 1, 256)


def test_vgg_fpn_ef_config():
    out = _init_and_run(VGG_FPN(cfg="EF", input_size=160))
    assert len(out) == 4 and all(o.shape[-1] == 256 for o in out)


def test_vgg_fpn_small_input_no_stem_downsample():
    out = _init_and_run(VGG_FPN(cfg="AF", input_size=64), shape=(1, 16, 16, 16, 4))
    # stride-1 stem: stage strides are {1,2,4,8}
    assert out[0].shape == (1, 16, 16, 16, 256)


def test_vgg_conv_at_start():
    out = _init_and_run(VGG_FPN(cfg="AF", input_size=160, conv_at_start=True))
    assert out[0].shape == (1, 8, 8, 8, 256)


def test_vgg_nonuniform_grid():
    out = _init_and_run(VGG_FPN(cfg="AF", input_size=160), shape=(2, 32, 64, 32, 4))
    assert out[0].shape == (2, 8, 16, 8, 256)


def test_resnet_fpn_256():
    out = _init_and_run(ResNet_FPN_256(layers=(1, 1, 1, 1), is_max_pool=True))
    assert len(out) == 4
    assert out[0].shape == (1, 8, 8, 8, 256)
    assert out[3].shape == (1, 1, 1, 1, 256)


def test_resnet_fpn_64():
    out = _init_and_run(ResNet_FPN_64(layers=(1, 1, 1, 1)), shape=(1, 16, 16, 16, 4))
    assert len(out) == 4
    assert out[0].shape == (1, 16, 16, 16, 64)


def test_resnet_simplified():
    out = _init_and_run(ResNetSimplified(out_channels=32, num_residuals=1))
    assert len(out) == 1 and out[0].shape == (1, 32, 32, 32, 32)


def test_build_backbone_factory():
    m = build_backbone("vgg_EF")
    assert isinstance(m, VGG_FPN) and m.cfg == "EF"
    m = build_backbone("resnet")
    assert isinstance(m, ResNet_FPN_256)


def test_backbone_finite_and_grad():
    model = VGG_FPN(cfg="AF", input_size=160)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 32, 4)), jnp.float32)
    params = model.init(jax.random.key(0), x)

    def loss(p):
        return sum(jnp.sum(o**2) for o in model.apply(p, x))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
