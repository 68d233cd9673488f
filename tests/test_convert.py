"""Weight-converter parity: reference torch modules vs converted flax modules.

Builds the *actual reference network modules* (torch-cpu, loaded straight
from the mounted reference tree), converts their random state dicts with
`animals3d_tpu.convert`, and checks forward outputs agree — the test pattern
that guards the pretrained-checkpoint bit-compatibility gate.
"""
import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animals3d_tpu import convert
from animals3d_tpu.networks.articulation import ArticulationNetwork
from animals3d_tpu.networks.encoders import Encoder32
from animals3d_tpu.networks.mlp import MLP, CoordMLP, CoordMLPMod
from animals3d_tpu.networks.motion_vae import ArticulationVAE

REF = "/root/reference/model/networks"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def refnets():
    for name in ("torchvision", "torchvision.models",
                 "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    pkg = types.ModuleType("refnets")
    pkg.__path__ = [REF]
    sys.modules["refnets"] = pkg
    return {
        "MLPs": importlib.import_module("refnets.MLPs"),
        "Art": importlib.import_module("refnets.ArticulationNetwork"),
        "VAE": importlib.import_module("refnets.MotionVAE"),
        "Enc": importlib.import_module("refnets.encoders"),
    }


def _sd(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def test_coord_mlp_parity(refnets):
    import torch
    torch.manual_seed(0)
    ref = refnets["MLPs"].CoordMLP(3, 4, 3, nf=16, activation="sigmoid",
                                   min_max=torch.tensor([[0., 1.]] * 4),
                                   n_harmonic_functions=4,
                                   embedder_scalar=0.9, extra_feat_dim=6,
                                   symmetrize=True)
    x = np.random.default_rng(0).normal(size=(2, 5, 3)).astype(np.float32)
    feat = np.random.default_rng(1).normal(size=(2, 6)).astype(np.float32)
    want = ref(torch.tensor(x), feat=torch.tensor(feat)).detach().numpy()

    mine = CoordMLP(3, 4, 3, nf=16, activation="sigmoid",
                    min_max=((0., 1.),) * 4, n_harmonic_functions=4,
                    embedder_scalar=0.9, extra_feat_dim=6, symmetrize=True)
    params = convert.convert_coord_mlp(_sd(ref), 3)
    got = mine.apply({"params": params}, jnp.asarray(x), jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_coord_mlp_mod_parity(refnets):
    import torch
    torch.manual_seed(1)
    ref = refnets["MLPs"].CoordMLP_Mod(3, 1, 3, nf=16,
                                       n_harmonic_functions=4,
                                       embedder_scalar=0.9, condition_dim=8)
    x = np.random.default_rng(0).normal(size=(2, 5, 3)).astype(np.float32)
    feat = np.random.default_rng(1).normal(size=(2, 8)).astype(np.float32)
    want = ref(torch.tensor(x), feat=torch.tensor(feat)).detach().numpy()

    mine = CoordMLPMod(3, 1, 3, nf=16, n_harmonic_functions=4,
                       embedder_scalar=0.9, condition_dim=8)
    params = convert.convert_coord_mlp_mod(_sd(ref), 3)
    got = mine.apply({"params": params}, jnp.asarray(x), jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_encoder32_parity(refnets):
    import torch
    torch.manual_seed(2)
    ref = refnets["Enc"].Encoder32(8, 5, nf=16)
    x = np.random.default_rng(0).normal(size=(2, 8, 32, 32)).astype(np.float32)
    want = ref(torch.tensor(x)).detach().numpy()
    mine = Encoder32(cout=5, nf=16)
    params = convert.convert_encoder32(_sd(ref))
    got = mine.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_articulation_attention_parity(refnets):
    import torch
    torch.manual_seed(3)
    ref = refnets["Art"].ArticulationNetwork(
        "attention", 8, posenc_dim=9, num_layers=2, nf=16,
        n_harmonic_functions=4, embedder_scalar=1.0)
    ref.eval()
    feat = np.random.default_rng(0).normal(size=(2, 6, 8)).astype(np.float32)
    pos = np.random.default_rng(1).normal(size=(2, 6, 9)).astype(np.float32)
    want = ref(torch.tensor(feat), torch.tensor(pos)).detach().numpy()
    mine = ArticulationNetwork("attention", 8, 9, 2, 16,
                               n_harmonic_functions=4, embedder_scalar=1.0)
    params = convert.convert_articulation_net(_sd(ref), 2, "attention")
    got = mine.apply({"params": params}, jnp.asarray(feat), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_motion_vae_decoder_parity(refnets):
    """Deterministic decoder path (encoder+reparam needs matched rng)."""
    import torch
    torch.manual_seed(4)
    ref = refnets["VAE"].ArticulationVAE(
        njoints=4, feat_dim=8, pos_dim=9, n_harmonic_functions=2,
        harmonic_omega0=1.0, latent_dim=16, z_token_num=2,
        transformer_layer_num=1)
    ref.eval()
    z = np.random.default_rng(0).normal(size=(2, 3, 16)).astype(np.float32)
    want = ref.decode(torch.tensor(z), nframes=5).detach().numpy()  # B,J,3,F

    mine = ArticulationVAE(njoints=4, feat_dim=8, pos_dim=9,
                           n_harmonic_functions=2, harmonic_omega0=1.0,
                           latent_dim=16, z_token_num=2,
                           transformer_layer_num=1)
    params = convert.convert_motion_vae(_sd(ref), 1)
    got = mine.apply({"params": params}, jnp.asarray(z), 5,
                     method=lambda m, zz, nf: m.decoder(zz, nf))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_motion_vae_encoder_parity(refnets):
    import torch
    torch.manual_seed(5)
    ref = refnets["VAE"].ArticulationVAE(
        njoints=4, feat_dim=8, pos_dim=9, n_harmonic_functions=2,
        harmonic_omega0=1.0, latent_dim=16, z_token_num=2,
        transformer_layer_num=1)
    ref.eval()
    B, F, J = 2, 5, 4
    feat = np.random.default_rng(0).normal(size=(B * F, J, 8)).astype(np.float32)
    pos = np.random.default_rng(1).normal(size=(B * F, J, 9)).astype(np.float32)
    with torch.no_grad():
        p = torch.cat([torch.tensor(pos), ref.posenc(torch.tensor(pos))], -1)
        x = torch.cat([torch.tensor(feat), p], -1)
        x = ref.in_layer(x).reshape(B, F, J, 16).permute(0, 2, 3, 1)
        mu_w, logvar_w = ref.encode(x)

    mine = ArticulationVAE(njoints=4, feat_dim=8, pos_dim=9,
                           n_harmonic_functions=2, harmonic_omega0=1.0,
                           latent_dim=16, z_token_num=2,
                           transformer_layer_num=1)
    params = convert.convert_motion_vae(_sd(ref), 1)

    def enc(m, feat, pos):
        x = m._embed(feat, pos)
        x = x.reshape(B, F, J, 16).transpose(0, 2, 3, 1)
        return m.encoder(x)

    mu_g, logvar_g = mine.apply({"params": params}, jnp.asarray(feat),
                                jnp.asarray(pos), method=enc)
    np.testing.assert_allclose(np.asarray(mu_g), mu_w.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_g), logvar_w.numpy(),
                               atol=1e-4)


def test_vgg_encoder_parity():
    """VGGEncoder vs a torchvision-naming torch transcription
    (reference `encoders.py:91-106`) on random weights."""
    import torch
    import torchvision_oracle as tvo
    from animals3d_tpu.networks.encoders import VGGEncoder

    class RefVGGEncoder(torch.nn.Module):
        def __init__(self, cout):
            super().__init__()
            vgg = tvo.VGG16()
            self.vgg_encoder = torch.nn.Sequential(vgg.features, vgg.avgpool)
            self.linear1 = torch.nn.Linear(25088, 4096)
            self.linear2 = torch.nn.Linear(4096, cout)
            self.relu = torch.nn.ReLU(inplace=True)

        def forward(self, x):
            b = x.shape[0]
            out = self.relu(self.linear1(self.vgg_encoder(x).view(b, -1)))
            return self.linear2(out)

    ref = tvo.randomize_(RefVGGEncoder(7), seed=5)
    x = np.random.default_rng(3).normal(
        size=(1, 3, 224, 224)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    params = convert.convert_vgg_encoder(_sd(ref))
    got = VGGEncoder(cout=7).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3, rtol=1e-3)


def test_resnet_encoders_parity():
    """ResnetEncoder + ResnetDepthEncoder vs the torch transcription
    (reference `encoders.py:108-146`), incl. BN running stats and the
    layer2 local-feature tap + ImageNet normalization."""
    import torch
    import torchvision_oracle as tvo
    from animals3d_tpu.networks.encoders import (ResnetDepthEncoder,
                                                 ResnetEncoder)

    class RefResnetEncoder(torch.nn.Module):
        def __init__(self, cout):
            super().__init__()
            self.resnet = tvo.ResNet18()
            self.final_linear = torch.nn.Linear(512, cout)

        def forward(self, x):
            return self.final_linear(self.resnet(x)[0])

    ref = tvo.randomize_(RefResnetEncoder(6), seed=7)
    x = np.random.default_rng(4).normal(
        size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    params = convert.convert_resnet_encoder(_sd(ref))
    got = ResnetEncoder(cout=6).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)

    # depth encoder: normalization + layer2 tap
    class RefDepth(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = tvo.ResNet18()
            m = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
            s = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
            self.register_buffer("m", m)
            self.register_buffer("s", s)

        def forward(self, x):
            return self.resnet((x - self.m) / self.s)

    refd = tvo.randomize_(RefDepth(), seed=9)
    xd = np.random.default_rng(5).uniform(
        0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_g, want_l = refd(torch.tensor(xd))
    params = convert.convert_resnet_depth_encoder(
        {k: v for k, v in _sd(refd).items() if k.startswith("resnet.")})
    got_g, got_l = ResnetDepthEncoder().apply({"params": params},
                                              jnp.asarray(xd))
    np.testing.assert_allclose(np.asarray(got_g), want_g.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_l), want_l.numpy(),
                               atol=2e-4, rtol=1e-4)
