"""UNet structure/shape tests on the tiny config (CPU-runnable)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.models.unet import SDXLUNet, UNetConfig

# fast lane: `pytest -m "not slow"` (compile-heavy module, README: Testing)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = UNetConfig.tiny()
    model = SDXLUNet(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    B = 2
    batch = dict(
        sample=jnp.zeros((B, 4, 16, 16)),
        timesteps=jnp.asarray([10, 500]),
        encoder_hidden_states=jnp.zeros((B, 77, cfg.cross_attention_dim)),
        text_embeds=jnp.zeros((B, cfg.pooled_embed_dim)),
        time_ids=jnp.tile(jnp.asarray([[512., 512., 0., 0., 512., 512.]]), (B, 1)),
    )
    params = model.init(jax.random.key(0), **batch)
    return model, params, batch


def test_output_shape(tiny_setup):
    model, params, batch = tiny_setup
    out = model.apply(params, **batch)
    assert out.shape == (2, 4, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_param_tree_has_diffusers_names(tiny_setup):
    _, params, _ = tiny_setup
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(getattr(k, 'key', k)) for k in path) for path, _ in flat}
    joined = "\n".join(names)
    for expect in ["conv_in", "time_embedding", "add_embedding",
                   "down_blocks_0_resnets_0", "down_blocks_1_attentions_0",
                   "mid_block_attentions_0", "up_blocks_0_resnets_1",
                   "up_blocks_1_upsamplers_0", "conv_norm_out", "conv_out",
                   "attn1", "attn2", "to_q", "to_out_0", "ff", "proj_in"]:
        assert expect in joined, f"missing {expect}"


def test_timestep_affects_output(tiny_setup):
    model, params, batch = tiny_setup
    b2 = dict(batch, sample=jax.random.normal(jax.random.key(1), (2, 4, 16, 16)))
    o1 = model.apply(params, **b2)
    o2 = model.apply(params, **dict(b2, timesteps=jnp.asarray([999, 1])))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_context_affects_output(tiny_setup):
    model, params, batch = tiny_setup
    b2 = dict(batch, sample=jax.random.normal(jax.random.key(1), (2, 4, 16, 16)))
    o1 = model.apply(params, **b2)
    ctx = jax.random.normal(jax.random.key(2), b2["encoder_hidden_states"].shape)
    o2 = model.apply(params, **dict(b2, encoder_hidden_states=ctx))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_float_timesteps_flow_matching_style(tiny_setup):
    model, params, batch = tiny_setup
    out = model.apply(params, **dict(batch, timesteps=jnp.asarray([0.25, 0.75])))
    assert np.isfinite(np.asarray(out)).all()


def test_non_square_buckets(tiny_setup):
    model, params, batch = tiny_setup
    b, cfg = 1, UNetConfig.tiny()
    batch2 = dict(
        sample=jnp.zeros((b, 4, 8, 24)),
        timesteps=jnp.asarray([3]),
        encoder_hidden_states=jnp.zeros((b, 77, cfg.cross_attention_dim)),
        text_embeds=jnp.zeros((b, cfg.pooled_embed_dim)),
        time_ids=jnp.zeros((b, 6)),
    )
    out = model.apply(params, **batch2)
    assert out.shape == (1, 4, 8, 24)


def test_jit_and_grad(tiny_setup):
    model, params, batch = tiny_setup

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, **batch)
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least one nonzero gradient
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_sdxl_config_structure():
    cfg = UNetConfig.sdxl()
    assert cfg.time_embed_dim == 1280
    assert cfg.pooled_embed_dim == 1280
    assert cfg.projection_class_embeddings_input_dim == 2816


@pytest.mark.parametrize("policy", ["dots", "dots_nobatch", "dots_small"])
def test_selective_remat_policy_matches_full(policy):
    """Selective remat policies compute the same function and gradients as
    full remat — they only change what the backward recomputes."""
    import jax
    from sdxl_training_improvements_tpu.models.unet import SDXLUNet, UNetConfig
    cfg_full = UNetConfig.tiny(remat=True)
    cfg_dots = UNetConfig.tiny(remat=True, remat_policy=policy)
    args = (jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
            jnp.ones((1, 77, cfg_full.cross_attention_dim)) * 0.1,
            jnp.ones((1, cfg_full.pooled_embed_dim)) * 0.1,
            jnp.zeros((1, 6)))
    m_full = SDXLUNet(config=cfg_full, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    m_dots = SDXLUNet(config=cfg_dots, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    params = m_full.init(jax.random.key(0), *args)

    def loss(m, p):
        return (m.apply(p, *args) ** 2).mean()

    l1, g1 = jax.value_and_grad(lambda p: loss(m_full, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(m_dots, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7)


def test_small_dots_policy_thresholds_saves():
    """_small_dots_policy saves a non-batched dot output iff it is under
    the element threshold; batched dots (attention scores) never save."""
    import jax
    from jax._src.ad_checkpoint import saved_residuals
    from sdxl_training_improvements_tpu.models.unet import _small_dots_policy

    def f(x, w1, w2):
        h = x @ w1          # [8, 64] = 512 elements
        return (h @ w2)     # [8, 4]

    x = jnp.ones((8, 16), jnp.float32)
    w1 = jnp.ones((16, 64), jnp.float32)
    w2 = jnp.ones((64, 4), jnp.float32)

    def residual_shapes(max_el):
        g = jax.checkpoint(f, policy=_small_dots_policy(max_el))
        res = saved_residuals(g, x, w1, w2)
        return [tuple(a.shape) for a, _ in res]

    # threshold above 512: the [8, 64] intermediate is saved
    assert (8, 64) in residual_shapes(1024)
    # threshold below 512: it is recomputed instead
    assert (8, 64) not in residual_shapes(256)

    # a batched dot (batch dim in dimension_numbers) is never saved
    def bf(q, k):
        return jnp.einsum("bqd,bkd->bqk", q, k).sum()
    q = jnp.ones((2, 4, 8), jnp.float32)
    k = jnp.ones((2, 4, 8), jnp.float32)
    g = jax.checkpoint(bf, policy=_small_dots_policy(1 << 30))
    shapes = [tuple(a.shape) for a, _ in saved_residuals(g, q, k)]
    assert (2, 4, 4) not in shapes


def test_bad_remat_policy_raises():
    import jax
    from sdxl_training_improvements_tpu.models.unet import SDXLUNet, UNetConfig
    cfg = UNetConfig.tiny(remat=True, remat_policy="bogus")
    m = SDXLUNet(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    with pytest.raises(ValueError, match="remat_policy"):
        m.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16)),
               jnp.zeros((1,)), jnp.zeros((1, 77, cfg.cross_attention_dim)),
               jnp.zeros((1, cfg.pooled_embed_dim)), jnp.zeros((1, 6)))


# --------------------------------------------------------------------------
# UNetConfig.from_diffusers_config: checkpoint-declared topology
# --------------------------------------------------------------------------

def _sdxl_base_unet_json():
    """The topology fields of SDXL-base's ``unet/config.json``."""
    return {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
        "layers_per_block": 2,
        "transformer_layers_per_block": [1, 2, 10],
        "attention_head_dim": [5, 10, 20],
        "cross_attention_dim": 2048,
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": 256,
        "projection_class_embeddings_input_dim": 2816,
        "norm_num_groups": 32,
        "mid_block_type": "UNetMidBlock2DCrossAttn",
    }


def test_from_diffusers_config_base_matches_sdxl():
    got = UNetConfig.from_diffusers_config(_sdxl_base_unet_json())
    want = UNetConfig.sdxl()
    for f in ("in_channels", "out_channels", "block_out_channels",
              "layers_per_block", "transformer_layers_per_block",
              "attention_head_dim", "cross_attention_dim",
              "addition_time_embed_dim",
              "projection_class_embeddings_input_dim", "num_time_ids",
              "norm_num_groups"):
        assert getattr(got, f) == getattr(want, f), f
    assert got.mid_depth == want.mid_depth == 10
    assert got.pooled_embed_dim == 1280


def test_from_diffusers_config_inpainting():
    cfg = dict(_sdxl_base_unet_json(), in_channels=9)
    got = UNetConfig.from_diffusers_config(cfg)
    assert got.in_channels == 9 and got.out_channels == 4
    assert got.num_time_ids == 6


def test_from_diffusers_config_refiner_shape():
    cfg = {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [384, 768, 1536, 1536],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D", "DownBlock2D"],
        "layers_per_block": 2,
        "transformer_layers_per_block": 4,
        "attention_head_dim": [6, 12, 24, 24],
        "cross_attention_dim": 1280,
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": 256,
        "projection_class_embeddings_input_dim": 2560,
    }
    got = UNetConfig.from_diffusers_config(cfg)
    assert got.transformer_layers_per_block == (0, 4, 4, 0)
    assert got.mid_depth == 4
    assert got.attention_head_dim == 64
    assert got.num_time_ids == 5
    assert got.pooled_embed_dim == 1280
    assert got.cross_attention_dim == 1280


def test_from_diffusers_config_overrides_and_errors():
    base = _sdxl_base_unet_json()
    got = UNetConfig.from_diffusers_config(base, remat=False,
                                           attn_impl="xla")
    assert got.remat is False and got.attn_impl == "xla"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="addition_embed_type"):
        UNetConfig.from_diffusers_config(dict(base, addition_embed_type="text"))
    with _pytest.raises(ValueError, match="down block type"):
        UNetConfig.from_diffusers_config(
            dict(base, down_block_types=["AttnDownBlock2D"] * 3))
    with _pytest.raises(ValueError, match="non-constant head dim"):
        UNetConfig.from_diffusers_config(
            dict(base, attention_head_dim=[5, 10, 10]))
    with _pytest.raises(ValueError, match="num_time_ids"):
        UNetConfig.from_diffusers_config(
            dict(base, projection_class_embeddings_input_dim=2817))


class TestDeepCacheSplit:
    """The DeepCache split contract (SDXLUNet deep_cache/return_deep):
    injecting the TRUE deep feature must reproduce the full forward
    bit-exactly — the shallow path runs the identical stage-0/last-stage
    ops, so any divergence is a wiring bug, not an approximation."""

    def _io(self, cfg, seed=0):
        import numpy as np
        rng = np.random.default_rng(seed)
        b = 2
        return (rng.standard_normal((b, cfg.in_channels, 16, 16)
                                    ).astype(np.float32),
                np.array([3.0, 700.0], np.float32),
                rng.standard_normal((b, 77, cfg.cross_attention_dim)
                                    ).astype(np.float32),
                rng.standard_normal((b, cfg.pooled_embed_dim)
                                    ).astype(np.float32),
                np.array([[512, 512, 0, 0, 512, 512][:cfg.num_time_ids]] * b,
                         np.float32))

    def test_shallow_with_true_deep_is_exact(self):
        cfg = UNetConfig.tiny()
        m = SDXLUNet(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        s, t, e, p, ti = self._io(cfg)
        params = m.init(jax.random.key(0), s, t, e, p, ti)
        full = m.apply(params, s, t, e, p, ti)
        out2, deep = m.apply(params, s, t, e, p, ti, return_deep=True)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(out2))
        # deep feature: full latent resolution, channels of stage 1
        assert deep.shape == (2, 16, 16, cfg.block_out_channels[1])
        shallow = m.apply(params, s, t, e, p, ti, deep_cache=deep)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(shallow))

    def test_refiner_topology_split(self):
        """4-stage variant (plain last stage): the split generalises."""
        cfg = UNetConfig(
            block_out_channels=(16, 32, 64, 64), layers_per_block=1,
            transformer_layers_per_block=(0, 1, 1, 0),
            mid_block_transformer_layers=1, attention_head_dim=8,
            cross_attention_dim=32, addition_time_embed_dim=4,
            projection_class_embeddings_input_dim=24 + 5 * 4,
            num_time_ids=5, norm_num_groups=8, remat=False, attn_impl="xla")
        m = SDXLUNet(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        s, t, e, p, ti = self._io(cfg, seed=3)
        params = m.init(jax.random.key(1), s, t, e, p, ti)
        full, deep = m.apply(params, s, t, e, p, ti, return_deep=True)
        assert deep.shape == (2, 16, 16, cfg.block_out_channels[1])
        shallow = m.apply(params, s, t, e, p, ti, deep_cache=deep)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(shallow))

    def test_deep_cache_excludes_return_deep(self):
        cfg = UNetConfig.tiny()
        m = SDXLUNet(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        s, t, e, p, ti = self._io(cfg)
        params = m.init(jax.random.key(0), s, t, e, p, ti)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="deep_cache"):
            m.apply(params, s, t, e, p, ti,
                    deep_cache=jnp.zeros((2, 16, 16, 64)), return_deep=True)
