import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.models.encoders import (
    FashionCNN,
    LeNet,
    LeNet5,
    ResNet,
    ResNetEncoder,
    SimNet,
    SimpleEncoder,
)

torch = pytest.importorskip("torch")


@pytest.mark.parametrize(
    "module,shape,out_shape",
    [
        (SimpleEncoder(out_dim=7), (2, 8, 8, 1), (2, 7)),
        (LeNet(num_classes=5, n_input_padding=2), (2, 28, 28, 1), (2, 5)),
        (LeNet5(num_classes=5, n_input_padding=2), (2, 28, 28, 1), (2, 5)),
        (FashionCNN(out_dim=4), (2, 28, 28, 1), (2, 4)),
        (FashionCNN(out_dim=4, use_for_guidance=True), (2, 28, 28, 1), (2, 4)),
        (SimNet(), (2, 28, 28, 1), (2, 64 * 4 * 4)),
        (ResNet(num_classes=3, arch="resnet18"), (2, 32, 32, 3), (2, 3)),
        (ResNetEncoder(feature_dim=16, arch="resnet18"), (2, 32, 32, 3), (2, 16)),
    ],
)
def test_encoder_shapes(module, shape, out_shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    v = module.init(jax.random.PRNGKey(1), x)
    out = module.apply(v, x)
    assert out.shape == out_shape
    assert np.isfinite(np.asarray(out)).all()


def test_resnet50_builds():
    m = ResNet(num_classes=2, arch="resnet50")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(1), x)
    assert m.apply(v, x).shape == (1, 2)


# ---------------------------------------------------------------- converters


def _torch_mapping_mlp(num_classes=2, in_features=24):
    import torch.nn as nn

    class Classifier(nn.Module):
        def __init__(self):
            super().__init__()
            self.linear1 = nn.Linear(in_features, 16)
            self.linear2 = nn.Linear(16, 8)
            self.linear3 = nn.Linear(8, 4)
            self.linear4 = nn.Linear(4, num_classes)

        def forward(self, x):
            import torch.nn.functional as F

            x = x.reshape(x.shape[0], -1)
            x = F.relu(self.linear1(x))
            x = F.relu(self.linear2(x))
            x = F.relu(self.linear3(x))
            return self.linear4(x)

    return Classifier()


def test_convert_mapping_mlp_parity():
    from ladine_tpu.models import MappingMLP
    from ladine_tpu.utils.torch_convert import convert_mapping_mlp

    tm = _torch_mapping_mlp().eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    params = convert_mapping_mlp(sd)
    mlp = MappingMLP(num_classes=2, hidden_dims=(16, 8, 4))
    x = np.random.default_rng(0).normal(size=(3, 4, 6)).astype(np.float32)
    ours = mlp.apply({"params": params}, jnp.asarray(x))
    theirs = tm(torch.tensor(x.reshape(3, -1))).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


def _torch_conditional_model(data_dim=24, hidden=8, feat=8, y_dim=2, n_steps=11):
    import torch.nn as nn

    class ConditionalLinear(nn.Module):
        def __init__(self, num_in, num_out, n_steps):
            super().__init__()
            self.num_out = num_out
            self.lin = nn.Linear(num_in, num_out)
            self.embed = nn.Embedding(n_steps, num_out)
            self.embed.weight.data.uniform_()

        def forward(self, x, t):
            gamma = self.embed(t)
            return gamma.view(-1, self.num_out) * self.lin(x)

    class CM(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_x = nn.Sequential(
                nn.Linear(data_dim, hidden), nn.BatchNorm1d(hidden), nn.Softplus(),
                nn.Linear(hidden, hidden), nn.BatchNorm1d(hidden), nn.Softplus(),
                nn.Linear(hidden, feat),
            )
            self.norm = nn.BatchNorm1d(feat)
            self.lin1 = ConditionalLinear(y_dim * 2, feat, n_steps)
            self.unetnorm1 = nn.BatchNorm1d(feat)
            self.lin2 = ConditionalLinear(feat, feat, n_steps)
            self.unetnorm2 = nn.BatchNorm1d(feat)
            self.lin3 = ConditionalLinear(feat, feat, n_steps)
            self.unetnorm3 = nn.BatchNorm1d(feat)
            self.lin4 = nn.Linear(feat, y_dim)

        def forward(self, x, y, t, yhat):
            import torch.nn.functional as F

            x = self.norm(self.encoder_x(x))
            y = torch.cat([y, yhat], dim=-1)
            y = F.softplus(self.unetnorm1(self.lin1(y, t)))
            y = x * y
            y = F.softplus(self.unetnorm2(self.lin2(y, t)))
            y = F.softplus(self.unetnorm3(self.lin3(y, t)))
            return self.lin4(y)

    return CM()


def test_convert_conditional_model_parity():
    from ladine_tpu.models import ConditionalModel
    from ladine_tpu.utils.torch_convert import convert_conditional_model

    tm = _torch_conditional_model()
    # push running stats off their init
    with torch.no_grad():
        tm.train()
        for _ in range(3):
            x = torch.randn(16, 24)
            y = torch.randn(16, 2)
            yh = torch.softmax(torch.randn(16, 2), -1)
            tm(x, y, torch.randint(0, 11, (16,)), yh)
    tm.eval()
    variables = convert_conditional_model(tm.state_dict())

    model = ConditionalModel(data_dim=24, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=11)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 24)).astype(np.float32)
    y = rng.normal(size=(5, 2)).astype(np.float32)
    yh = rng.random((5, 2)).astype(np.float32)
    for t in [0, 5, 10]:
        ours = model.apply(variables, jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(yh))
        theirs = tm(torch.tensor(x), torch.tensor(y),
                    torch.tensor([t]), torch.tensor(yh)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-5)


def _torch_vit(depth=2, embed=16, heads=2, img=16, patch=8, num_classes=2):
    import torch.nn as nn

    class Attention(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(embed, embed * 3)
            self.proj = nn.Linear(embed, embed)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(embed, embed * 4)
            self.fc2 = nn.Linear(embed * 4, embed)

        def forward(self, x):
            import torch.nn.functional as F

            return self.fc2(F.gelu(self.fc1(x)))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(embed, eps=1e-6)
            self.attn = Attention()
            self.norm2 = nn.LayerNorm(embed, eps=1e-6)
            self.mlp = Mlp()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(3, embed, patch, patch)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class ViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            n = (img // patch) ** 2
            self.cls_token = nn.Parameter(torch.zeros(1, 1, embed))
            self.pos_embed = nn.Parameter(torch.randn(1, n + 1, embed) * 0.02)
            self.blocks = nn.ModuleList([Block() for _ in range(depth)])
            self.norm = nn.LayerNorm(embed, eps=1e-6)
            self.head = nn.Linear(embed, num_classes)

        def forward(self, x):
            x = self.patch_embed(x)
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            x = self.norm(x)
            return self.head(x[:, 0])

    return ViT()


def test_convert_vit_parity():
    from ladine_tpu.models import ViT
    from ladine_tpu.utils.torch_convert import convert_vit

    tm = _torch_vit().eval()
    params = convert_vit(tm.state_dict(), depth=2)
    vit = ViT(num_classes=2, img_size=16, patch_size=8, embed_dim=16, depth=2, num_heads=2)
    rng = np.random.default_rng(2)
    x = rng.random((3, 16, 16, 3)).astype(np.float32)
    ours = vit.apply({"params": params}, jnp.asarray(x))
    theirs = tm(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-5)
    # the tap path too (bare patches, no cls/pos)
    taps = vit.apply({"params": params}, jnp.asarray(x), (1,), method="tap_features")
    with torch.no_grad():
        t = tm.patch_embed(torch.tensor(x).permute(0, 3, 1, 2))
        t = tm.blocks[0](t)
    np.testing.assert_allclose(np.asarray(taps[0]), t.numpy(), rtol=1e-3, atol=1e-5)
