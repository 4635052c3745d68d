"""Runtime layer tests: config overlay, checkpoint round-trip, mesh DP."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.runtime import (CheckpointManager, DictConfig,
                                    get_basic_config, get_config, load_states,
                                    save_states)
from tts_arabic_tpu.parallel import (data_parallel_jit, make_mesh,
                                     pad_batch_to_devices, shard_batch)


def test_config_overlay(tmp_path):
    basic = tmp_path / "basic.yaml"
    basic.write_text("a: 1\nb: two\nnested:\n  x: 1\n")
    exp = tmp_path / "exp.yaml"
    exp.write_text("b: three\nc: 4\n")
    cfg = get_config(exp, basic_path=basic)
    assert cfg.a == 1 and cfg.b == "three" and cfg.c == 4
    assert cfg.nested.x == 1
    with pytest.raises(AttributeError):
        _ = cfg.missing


def test_repo_configs_load():
    cfg = get_basic_config()
    assert cfg.decoder_max_step == 3000
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1]
    for name in ["nawar_fp", "nawar_fp_adv", "nawar_tc2", "nawar_tc2_adv"]:
        c = get_config(root / "configs" / f"{name}.yaml")
        assert "label_pattern" in c and c.epochs == 500
    fp = get_config(root / "configs" / "nawar_fp.yaml")
    assert fp.max_lengths == [1000, 1300, 1850, 30000]
    assert fp.batch_sizes == [10, 8, 6, 4]


def test_checkpoint_roundtrip(tmp_path):
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": np.zeros(3, np.float32)}
    opt = {"mu": {"w": np.ones((2, 3), np.float32)}}
    p = tmp_path / "ckpt" / "states.ckpt"
    save_states(p, step=123, epoch=7, config={"dim": 384}, model=tree,
                optim=opt)
    back = load_states(p)
    assert back["step"] == 123 and back["epoch"] == 7
    assert back["config"]["dim"] == 384
    np.testing.assert_array_equal(back["model"]["w"], tree["w"])
    np.testing.assert_array_equal(back["optim"]["mu"]["w"], opt["mu"]["w"])


def test_checkpoint_manager_cadence(tmp_path):
    mgr = CheckpointManager(tmp_path, n_save_states_iter=2,
                            n_save_backup_iter=4)
    tree = {"w": np.zeros(2, np.float32)}
    assert mgr.maybe_save(1, model=tree) == []
    wrote = mgr.maybe_save(2, model=tree)
    assert [p.name for p in wrote] == ["states.ckpt"]
    wrote = mgr.maybe_save(4, model=tree)
    assert [p.name for p in wrote] == ["states.ckpt", "states_4.ckpt"]
    assert mgr.latest().name == "states.ckpt"


def test_data_parallel_step_psum():
    """A DP loss/grad step over an 8-device mesh must equal the single-device
    result (XLA inserts the psum)."""
    mesh = make_mesh()
    assert mesh.devices.size == 8

    params = {"w": jnp.asarray([[2.0, 0.0], [0.0, 1.0]])}
    batch = {"x": jnp.arange(16.0).reshape(8, 2),
             "y": jnp.ones((8, 2))}

    def loss_fn(params, batch):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2)

    def step(params, batch):
        return jax.value_and_grad(loss_fn)(params, batch)

    ref_loss, ref_grad = step(params, batch)
    dp_step = data_parallel_jit(step, mesh)
    loss, grad = dp_step(params, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad["w"]),
                               np.asarray(ref_grad["w"]), rtol=1e-6)


def test_pad_batch_to_devices():
    mesh = make_mesh()
    batch = {"x": np.ones((5, 3))}
    padded = pad_batch_to_devices(batch, mesh)
    assert padded["x"].shape == (8, 3)
    assert padded["x"][5:].sum() == 0


def test_data_parallel_inference_matches_single():
    """FastPitch2Wave with an 8-virtual-device mesh (batch axis sharded)
    must produce byte-identical waveforms to the single-device pipeline:
    batched synthesis is embarrassingly parallel (SURVEY.md §2.10)."""
    import numpy as np
    from tts_arabic_tpu.infer import FastPitch2Wave
    from tts_arabic_tpu.parallel import make_mesh

    texts = ["bisomi {ll~ahi", ">aholFA wasaholFA", "kayofa HAluka",
             "SabAHu {loxayori", "$ukorFA", "mar~aHabFA bikum",
             "layolapN saEiydapN", "SabAHu {ln~uwri"]

    single = FastPitch2Wave(seed=3, arabic_in=False)
    dp = FastPitch2Wave(seed=3, arabic_in=False, mesh=make_mesh())
    # nudge durations so synthesis is non-trivial (random init predicts ~0)
    for p in (single, dp):
        fc = p.model.variables["params"]["duration_predictor"]["fc"]
        fc["bias"] = fc["bias"] + 2.0

    w_single = single.tts(texts, batch_size=8, denoise=0.003)
    w_dp = dp.tts(texts, batch_size=8, denoise=0.003)
    assert len(w_single) == len(w_dp) == len(texts)
    for a, b in zip(w_single, w_dp):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_profiling_benchmark_and_annotations(tmp_path):
    import jax.numpy as jnp
    from tts_arabic_tpu.runtime import profiling

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    t = profiling.benchmark(lambda: f(x), warmup=1, iters=3)
    assert t.best_s > 0 and t.mean_s >= t.best_s and len(t.times_s) == 3
    assert "ms" in str(t)
    with profiling.annotate("matmul"):
        profiling.block(f(x))
    with profiling.trace(tmp_path):
        profiling.block(f(x))
    assert any(tmp_path.rglob("*"))  # trace files written


# ---- sequence-parallel vocoding ------------------------------------------

def _tiny_gen(F, B=2, seed=7):
    from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig
    cfg = HiFiGANConfig(upsample_initial_channel=32)
    gen = Generator(cfg)
    rng = jax.random.PRNGKey(seed)
    mel = jax.random.normal(rng, (B, F, cfg.num_mels), jnp.float32) - 5.0
    v = gen.init(rng, mel[:, :16])
    return gen, v, mel


def test_sp_vocode_matches_full_call():
    """Time-sharded vocoding over the 8-device mesh (ppermute halo
    exchange) must reproduce the single-device full call exactly when the
    mesh size divides F."""
    from tts_arabic_tpu.parallel import make_mesh, sp_vocode

    mesh = make_mesh()
    gen, v, mel = _tiny_gen(F=8 * 32)  # core=32 == 2*overlap minimum
    ref = np.asarray(gen.apply(v, mel))
    got = np.asarray(sp_vocode(gen.apply, v, mel, mesh))
    assert got.shape == ref.shape == (2, 8 * 32 * 256)
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


def test_sp_vocode_ragged_length():
    """F not divisible by the mesh: the sharded pass runs on a padded mel
    and the final overlap frames are re-vocoded at the true boundary —
    output must match the full call everywhere."""
    from tts_arabic_tpu.parallel import make_mesh, sp_vocode

    mesh = make_mesh()
    F = 8 * 32 + 17
    gen, v, mel = _tiny_gen(F=F)
    ref = np.asarray(gen.apply(v, mel))
    got = np.asarray(sp_vocode(gen.apply, v, mel, mesh))
    assert got.shape == ref.shape == (2, F * 256)
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


def test_sp_vocode_short_sequence_falls_back():
    """Sequences too short to split (core < 2*overlap) take the plain
    single-device path unchanged."""
    from tts_arabic_tpu.parallel import make_mesh, sp_vocode

    mesh = make_mesh()
    gen, v, mel = _tiny_gen(F=40)
    ref = np.asarray(gen.apply(v, mel))
    got = np.asarray(sp_vocode(gen.apply, v, mel, mesh))
    np.testing.assert_allclose(got, ref, atol=0, rtol=0)


def test_sp_vocode_vocos_backend():
    """sp_vocode is generic over any locally-computed vocoder: the Vocos
    ConvNeXt backbone + ISTFT head (receptive field ±27 frames + n_fft
    overlap-add edge) matches the single-device call with overlap=32."""
    from tts_arabic_tpu.parallel import make_mesh, sp_vocode
    from tts_arabic_tpu.vocoder.vocos import MelVocosModule

    mesh = make_mesh()
    mod = MelVocosModule(n_mels=80, dim=48, intermediate_dim=96,
                         num_layers=8)
    rng = jax.random.PRNGKey(11)
    F = 8 * 64
    mel = jax.random.normal(rng, (1, F, 80), jnp.float32) - 5.0
    v = mod.init(rng, mel[:, :80])
    ref = np.asarray(mod.apply(v, mel))
    got = np.asarray(sp_vocode(mod.apply, v, mel, mesh, overlap=32))
    assert got.shape == ref.shape == (1, F * 256)
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


def test_sp_vocode_2d_mesh_dp_times_sp():
    """DP × SP on a 2-D (data=2, seq=4) mesh: batch rows sharded over
    `data`, each row's time axis over `seq` — still exact vs the
    single-device full call."""
    from tts_arabic_tpu.parallel import (DATA_AXIS, SEQ_AXIS, make_mesh_2d,
                                         sp_vocode)

    mesh = make_mesh_2d(2, 4)
    gen, v, mel = _tiny_gen(F=4 * 32 + 9, B=4)
    ref = np.asarray(gen.apply(v, mel))
    got = np.asarray(sp_vocode(gen.apply, v, mel, mesh, axis=SEQ_AXIS,
                               batch_axis=DATA_AXIS))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)

    with pytest.raises(ValueError):
        sp_vocode(gen.apply, v, mel[:3], mesh, axis=SEQ_AXIS,
                  batch_axis=DATA_AXIS)


def test_sp_vocode_two_device_mesh():
    """Smallest nontrivial SP split (n=2): edge-device geometry only
    (sel offsets [2ov, 0], crops [0, 2ov]) — still exact."""
    from tts_arabic_tpu.parallel import make_mesh, sp_vocode

    mesh = make_mesh(n_devices=2)
    gen, v, mel = _tiny_gen(F=2 * 40, B=1)
    ref = np.asarray(gen.apply(v, mel))
    got = np.asarray(sp_vocode(gen.apply, v, mel, mesh))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)
