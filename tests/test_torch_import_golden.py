"""Golden net parity: reference torch models (random init) -> converted
weights -> identical outputs from the Flax ports."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ppvision_tpu.models.fan import FAN
from ppvision_tpu.models.stargan import (
    Discriminator,
    Generator,
    MappingNetwork,
    StyleEncoder,
)
from ppvision_tpu.utils import torch_import as ti

from .golden_reference import import_face_deid_models

IMG = 64  # small but covers every code path (learned/plain shortcuts)


@pytest.fixture(scope="module")
def ref_models():
    torch.manual_seed(0)
    ref_model, ref_wing = import_face_deid_models()
    return ref_model, ref_wing


def _np(x):
    return x.detach().numpy()


@pytest.mark.slow
def test_mapping_network_parity(ref_models):
    ref_model, _ = ref_models
    tm = ref_model.MappingNetwork(latent_dim=16, style_dim=64, num_domains=3).eval()
    params = ti.mapping_params_from_torch(
        {k: _np(v) for k, v in tm.state_dict().items()}, num_domains=3
    )
    z = np.random.default_rng(0).standard_normal((4, 16)).astype(np.float32)
    y = np.asarray([0, 2, 1, 0])
    with torch.no_grad():
        want = tm(torch.tensor(z), torch.tensor(y)).numpy()
    got = MappingNetwork(16, 64, 3).apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.slow
def test_style_encoder_and_discriminator_parity(ref_models):
    ref_model, _ = ref_models
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    y = np.asarray([1, 0])

    te = ref_model.StyleEncoder(img_size=IMG, style_dim=32, num_domains=2).eval()
    pe = ti.style_encoder_params_from_torch(
        {k: _np(v) for k, v in te.state_dict().items()}, img_size=IMG
    )
    with torch.no_grad():
        want = te(xt, torch.tensor(y)).numpy()
    got = StyleEncoder(IMG, 32, 2).apply(
        {"params": pe}, jnp.asarray(x), jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)

    td = ref_model.Discriminator(img_size=IMG, num_domains=2).eval()
    pd = ti.discriminator_params_from_torch(
        {k: _np(v) for k, v in td.state_dict().items()}, img_size=IMG
    )
    with torch.no_grad():
        want_d = td(xt, torch.tensor(y)).numpy()
    got_d = Discriminator(IMG, 2).apply({"params": pd}, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=3e-4)


@pytest.mark.slow
def test_generator_parity(ref_models):
    ref_model, _ = ref_models
    tg = ref_model.Generator(img_size=IMG, style_dim=16, w_hpf=1).eval()
    pg = ti.generator_params_from_torch(
        {k: _np(v) for k, v in tg.state_dict().items()},
        img_size=IMG, w_hpf=1.0,
    )
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    s = rng.standard_normal((1, 16)).astype(np.float32)
    masks_np = rng.uniform(size=(1, 256, 256, 1)).astype(np.float32)
    masks_t = torch.tensor(np.transpose(masks_np, (0, 3, 1, 2)))
    with torch.no_grad():
        want = tg(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))),
            torch.tensor(s),
            masks=[masks_t, masks_t],
        ).numpy()
    got = Generator(IMG, 16, w_hpf=1.0).apply(
        {"params": pg},
        jnp.asarray(x),
        jnp.asarray(s),
        (jnp.asarray(masks_np), jnp.asarray(masks_np)),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.slow
def test_fan_parity(ref_models):
    _, ref_wing = ref_models
    tf = ref_wing.FAN(num_modules=1).eval()
    pf = ti.fan_params_from_torch({k: _np(v) for k, v in tf.state_dict().items()})
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        want, _ = tf(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        want = want[-1].numpy()  # (1, 99, 64, 64)
    got = FAN().apply({"params": jax.tree_util.tree_map(jnp.asarray, pf)}, jnp.asarray(x))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-4)
