"""DinoViT parity vs a torch transcription of DINO's VisionTransformer.

Guards the riskiest leg of the bit-compatibility gate (SURVEY "Hard parts"
#3): the reference's image features come from torch.hub `dino_vits8`
(`/root/reference/model/networks/encoders.py:151`) with block-11 attention
keys hooked out (`:181-204`). `tests/dino_oracle.py` transcribes that
forward path; here we convert random torch weights with
`convert.convert_dino_vit` and require token + key agreement — including at
256 px where `interpolate_pos_encoding` bicubically resizes the 28×28 pos
grid (torch a=-0.75 kernel + the `+0.1` scale-factor quirk).
"""
import numpy as np
import pytest

from animals3d_tpu import convert
from animals3d_tpu.networks.vit import DinoViT

# tiny config: same architecture family, cheap to run on CPU
DIM, DEPTH, HEADS, PATCH, IMG = 48, 3, 4, 8, 224


def _build(depth=DEPTH, key_block=None):
    import torch
    from tests.dino_oracle import DinoVisionTransformer
    torch.manual_seed(0)
    ref = DinoVisionTransformer(img_size=IMG, patch_size=PATCH,
                                embed_dim=DIM, depth=depth, num_heads=HEADS)
    # non-trivial weights everywhere (default conv/linear inits are fine,
    # but norms are all-ones/zeros — perturb them so parity is meaningful)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "norm" in name:
                p.add_(torch.randn_like(p) * 0.05)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert.convert_dino_vit(sd, depth=depth)
    net = DinoViT(patch_size=PATCH, dim=DIM, depth=depth, num_heads=HEADS,
                  pos_grid=IMG // PATCH,
                  key_block=key_block if key_block is not None else depth - 1)
    return ref, net, params


@pytest.mark.parametrize("size", [224, 256, 160])
def test_dino_vit_parity(size):
    import torch
    ref, net, params = _build()
    x = np.random.default_rng(3).normal(size=(2, 3, size, size)) \
        .astype(np.float32)
    with torch.no_grad():
        want_tok, want_key = ref(torch.tensor(x), key_block=DEPTH - 1)
    tok, key = net.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(tok), want_tok.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(key), want_key.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_torch_bicubic_matrix_matches_interpolate():
    """The constant-matmul resize equals F.interpolate(..., 'bicubic') with
    DINO's scale-factor convention, to float32 roundoff."""
    import torch
    import torch.nn.functional as F
    from animals3d_tpu.networks.vit import torch_bicubic_matrix

    rng = np.random.default_rng(0)
    src = rng.normal(size=(1, 5, 28, 28)).astype(np.float32)
    for out in (32, 20, 28):
        sf = (out + 0.1) / 28.0
        want = F.interpolate(torch.tensor(src), scale_factor=(sf, sf),
                             mode="bicubic").numpy()
        m = torch_bicubic_matrix(28, out, sf)
        got = np.einsum("oi,bcij->bcoj", m, src)
        got = np.einsum("pj,bcoj->bcop", m, got)
        assert want.shape == got.shape == (1, 5, out, out)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
