"""Apps layer tests: CLIs driven end-to-end with a tiny saved checkpoint,
web server request/response, HTML builder, preprocessing."""
import dataclasses
import json
import pathlib
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.apps.html_report import (build_page, make_double_entry,
                                             make_multi_entry,
                                             make_sample_entry, write_page)
from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig
from tts_arabic_tpu.runtime.checkpoint import save_states

SMALL = FastPitchConfig(
    d_model=32, enc_n_layers=1, dec_n_layers=1, enc_d_head=8, dec_d_head=8,
    enc_filter_size=64, dec_filter_size=64, dur_filter_size=16,
    pitch_filter_size=16, energy_filter_size=16, attn_channels=8)


@pytest.fixture(scope="module")
def small_ckpt(tmp_path_factory):
    """A loadable .ckpt with biased durations so synthesis is non-trivial."""
    root = tmp_path_factory.mktemp("ckpt")
    model = FastPitch(SMALL)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32), max_frames=16)
    params = variables["params"]
    params["duration_predictor"]["fc"]["bias"] = (
        params["duration_predictor"]["fc"]["bias"] + 1.5)
    path = root / "fp_small.ckpt"
    save_states(path, step=0, config={
        "net_config": dataclasses.asdict(SMALL)}, model=params)
    return path


def test_html_builders(tmp_path):
    entries = [
        make_sample_entry("مرحبا", "a.wav", label="m1"),
        make_double_entry("نص", "a.wav", "b.wav"),
        make_multi_entry("نص آخر", ["a.wav", "b.wav"], ["x", "y"]),
    ]
    page = build_page(entries, title="t")
    assert page.count("<audio") == 5 and "volume" in page
    p = write_page(tmp_path / "idx.html", entries)
    assert p.exists() and "مرحبا" in p.read_text(encoding="utf-8")


def test_inference_cli(tmp_path, small_ckpt):
    from tts_arabic_tpu.apps.inference import main
    lst = tmp_path / "lines.txt"
    lst.write_text("صِفر\nواحِد\n", encoding="utf-8")
    out = tmp_path / "out"
    main(["--list", str(lst), "--checkpoint", str(small_ckpt),
          "--out-dir", str(out), "--batch-size", "2", "--cpu"])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2
    assert (out / "index.html").exists()
    from tts_arabic_tpu.audio import load_wav
    x, sr = load_wav(wavs[0])
    assert sr == 22050 and len(x) > 0


def test_smoke_test_cli(tmp_path, small_ckpt):
    from tts_arabic_tpu.apps.smoke_test import main
    out = tmp_path / "smoke"
    main(["--checkpoint", str(small_ckpt), "--out-dir", str(out), "--cpu"])
    assert (out / "sample.wav").exists()
    assert (out / "mel.png").exists()
    assert (out / "index.html").exists()


def test_server_endpoint(small_ckpt):
    from http.server import ThreadingHTTPServer
    from tts_arabic_tpu.apps import server as srv

    manager = srv.TTSManager([
        {"name": "fp-small", "type": "fastpitch",
         "checkpoint": str(small_ckpt)}])
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler(manager))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30) as r:
            page = r.read().decode()
        assert "textarea" in page and "/api/tts" in page

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/tts",
            data=json.dumps({"buckw": "Sifr", "rate": 1.0,
                             "denoise": 0.0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            data = json.loads(r.read())
        assert data["waves"] and data["waves"][0]["url"].endswith(".wav")

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{data['waves'][0]['url']}",
                timeout=30) as r:
            wav_bytes = r.read()
        assert wav_bytes[:4] == b"RIFF"
    finally:
        httpd.shutdown()


def test_preprocess_text_cli(tmp_path):
    from tts_arabic_tpu.apps.preprocess import preprocess_text
    tr = tmp_path / "orth.txt"
    tr.write_text("utt1|ذَهَبَ الوَلَدُ\nutt2|مَرحَباً\nutt3|صِفر\n",
                  encoding="utf-8")
    preprocess_text(tr, tmp_path / "data", split_ratio=0.67)
    for split in ("train", "test"):
        for kind in ("arab", "buckw", "phon"):
            assert (tmp_path / "data" / f"{split}_{kind}.txt").exists()
    line = (tmp_path / "data" / "train_phon.txt").read_text(
        encoding="utf-8").splitlines()[0]
    assert line.startswith('"utt1"')


def test_preprocess_audio_cli(tmp_path):
    from tts_arabic_tpu.apps.preprocess import preprocess_audio
    from tts_arabic_tpu.audio import save_wav, load_wav
    ind = tmp_path / "in"
    ind.mkdir()
    t = np.arange(44100) / 44100
    save_wav(ind / "x.wav", 0.4 * np.sin(2 * np.pi * 220 * t), 44100)
    preprocess_audio(ind, tmp_path / "outw", sr=22050)
    x, sr = load_wav(tmp_path / "outw" / "x.wav")
    assert sr == 22050
    assert np.abs(x[-768:]).max() < 1e-3  # zero pad appended


def test_download_manifest(capsys):
    from tts_arabic_tpu.apps.download import main
    main([])
    out = capsys.readouterr().out
    assert "fastpitch_ar_adv.pth" in out and "shakkala" in out


def test_download_verify_offline_skips_clean(tmp_path):
    """--verify with nothing present and no fetcher: every artifact skips,
    exit code 0 (the documented offline behavior)."""
    from tts_arabic_tpu.apps import download
    lines = []
    rc = download.run_verify(tmp_path, list(download.FILES), fetcher=None,
                             out=lines.append)
    assert rc == 0
    assert sum("skipped" in l for l in lines) == len(download.FILES)


def test_download_verify_with_fetcher(tmp_path):
    """--verify with a (monkeypatched) fetcher: the artifact is fetched,
    imported, and one sentence synthesized; corrupt artifacts FAIL and flip
    the exit code."""
    import torch

    from test_torch_import_layouts import _fastpitch_ckpt
    from tts_arabic_tpu.apps import download

    src, _ = _fastpitch_ckpt(tmp_path, "src_fastpitch.pth")

    fetched = []

    def fetcher(url, dest):
        assert url == download.FILES["fastpitch_ar_mse.pth"]["url"]
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_bytes(src.read_bytes())
        fetched.append(dest)

    lines = []
    rc = download.run_verify(tmp_path, ["fastpitch_ar_mse.pth"],
                             fetcher=fetcher, out=lines.append)
    assert rc == 0 and len(fetched) == 1
    ok_line = next(l for l in lines if "fastpitch_ar_mse" in l)
    assert "OK" in ok_line and "sha256" in ok_line and "mel 80x" in ok_line

    # corrupt artifact -> FAIL, nonzero exit
    bad = tmp_path / download.FILES["tacotron2_ar_mse.pth"]["path"]
    bad.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"model": {"nonsense.weight": torch.zeros(2)}}, bad)
    lines = []
    rc = download.run_verify(tmp_path, ["tacotron2_ar_mse.pth"],
                             fetcher=None, out=lines.append)
    assert rc == 1
    assert any("FAIL" in l for l in lines)


def test_server_stream_endpoint(small_ckpt):
    """POST /api/tts/stream returns chunked int16 PCM equal to the
    pipeline's own stream() output."""
    from http.server import ThreadingHTTPServer
    from tts_arabic_tpu.apps import server as srv

    manager = srv.TTSManager([
        {"name": "fp-small", "type": "fastpitch",
         "checkpoint": str(small_ckpt)}])
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler(manager))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/tts/stream",
            data=json.dumps({"buckw": "Sifr wAHid", "rate": 1.0,
                             "denoise": 0.0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            assert r.headers["X-Audio-Format"] == "s16le"
            sr = int(r.headers["X-Sample-Rate"])
            pcm = r.read()
        got = np.frombuffer(pcm, np.int16)
        assert sr == manager.models[0][1].sample_rate

        _, model = manager.models[0]
        ref = np.concatenate([np.asarray(c) for c in model.stream(
            "Sifr wAHid", denoise=0.0, out_int16=True)])
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)

        # mulaw format: uint8 codes decoding near the s16le stream
        from tts_arabic_tpu.audio import mulaw_decode
        req_m = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/tts/stream",
            data=json.dumps({"buckw": "Sifr wAHid", "rate": 1.0,
                             "denoise": 0.0, "format": "mulaw"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req_m, timeout=180) as r:
            assert r.headers["X-Audio-Format"] == "mulaw"
            mu = np.frombuffer(r.read(), np.uint8)
        back = mulaw_decode(mu)
        ref16 = got.astype(np.float32) / 32767.0
        assert back.shape == ref16.shape
        snr = 10 * np.log10((np.mean(ref16 ** 2) + 1e-12) /
                            (np.mean((back - ref16) ** 2) + 1e-12))
        assert snr > 20.0, snr  # plumbing check; codec SNR gated in test_pipeline

        # a synthesis error surfaces as a JSON 500, not a dropped socket
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/tts/stream",
            data=json.dumps({"buckw": "Sifr", "rate": "nonsense"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=60)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 500 and b"error" in e.read()
        assert raised
    finally:
        httpd.shutdown()


def test_export_serving_bundle(tmp_path, small_ckpt):
    """jax.export bundle round-trip: export encode/wave programs with
    baked weights, reload via ServingBundle (no checkpoint, no model
    construction) and match the live pipeline's int16 output exactly
    (mel frames are bucket-invariant, so differing bucket ladders don't
    matter)."""
    from tts_arabic_tpu.apps.export_serving import (ServingBundle,
                                                    export_bundle)
    from tts_arabic_tpu.infer import FastPitch2Wave

    out = export_bundle(tmp_path / "bundle", str(small_ckpt),
                        batch_sizes=(2,), text_buckets=(16,),
                        mel_buckets=(128, 256))
    assert (out / "manifest.json").exists()
    assert len(list(out.glob("*.shlo"))) == 3

    bundle = ServingBundle(out)
    texts = ["Sifr", "kitAb"]
    got = bundle.tts(texts, denoise=0.004)

    pipe = FastPitch2Wave(str(small_ckpt), arabic_in=False,
                          compute_dtype=jnp.bfloat16)
    ref = pipe.tts(texts, denoise=0.004, batch_size=2, out_int16=True)
    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        assert g.dtype == np.int16
        assert g.shape == r.shape
        np.testing.assert_array_equal(g, r)


def test_export_bundle_cross_platform_lowering(tmp_path, small_ckpt):
    """--platforms tpu,cpu: bundles cross-lower for TPU from a CPU host
    (the pod-shipping story) and still execute on the CPU backend."""
    from tts_arabic_tpu.apps.export_serving import (ServingBundle,
                                                    export_bundle)

    out = export_bundle(tmp_path / "xb", str(small_ckpt),
                        batch_sizes=(1,), text_buckets=(16,),
                        mel_buckets=(128,), platforms=("tpu", "cpu"))
    man = json.loads((out / "manifest.json").read_text())
    assert man["platforms"] == ["tpu", "cpu"]
    waves = ServingBundle(out).tts(["Sifr"], denoise=0.0)
    assert len(waves) == 1 and waves[0].dtype == np.int16
    assert len(waves[0]) > 0


def test_export_bundle_capacity_guards(tmp_path, small_ckpt):
    from tts_arabic_tpu.apps.export_serving import (ServingBundle,
                                                    export_bundle)

    out = export_bundle(tmp_path / "gb", str(small_ckpt), batch_sizes=(1,),
                        text_buckets=(16,), mel_buckets=(128,))
    b = ServingBundle(out)
    with pytest.raises(ValueError):
        b.tts(["Sifr", "kitAb"])  # > largest exported batch
    with pytest.raises(ValueError):
        b.tts(["b a " * 20])      # > largest exported text bucket


def test_export_bundle_tacotron(tmp_path):
    """Tacotron2 bundle round-trip: exported fused decode->truncate->vocode
    programs reproduce the live pipeline's int16 output (same baked
    PRNGKey(0) prenet rng, same EOS postprocess)."""
    from tts_arabic_tpu.apps.export_serving import (Tacotron2ServingBundle,
                                                    export_bundle_tacotron)
    from tts_arabic_tpu.infer import Tacotron2Wave

    out = export_bundle_tacotron(tmp_path / "t2b", batch_sizes=(2,),
                                 text_buckets=(16,), mel_buckets=(64, 128),
                                 max_steps=64)
    b = Tacotron2ServingBundle(out)
    texts = ["Sifr", "kitAb"]
    got = b.tts(texts, denoise=0.004)

    t2 = Tacotron2Wave(None, seed=0, arabic_in=False,
                       compute_dtype=jnp.bfloat16)
    t2.model.decoder_max_step = 64
    ref = t2.tts(texts, denoise=0.004, batch_size=2, out_int16=True)
    assert len(got) == 2
    for g, r in zip(got, ref):
        assert g.dtype == np.int16
        assert g.shape == r.shape
        np.testing.assert_allclose(g.astype(np.int32),
                                   r.astype(np.int32), atol=8)  # <=2.5e-4



@pytest.fixture(scope="module")
def eval_corpus(tmp_path_factory):
    """Tiny labels-file + wav-dir corpus for the evaluate CLI."""
    from tts_arabic_tpu.audio.io import save_wav
    root = tmp_path_factory.mktemp("evalcorpus")
    wav_dir = root / "wav"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    phon = ["m aa + s a l aa m", "k ii0 f + H aa l u0 k", "d a r s"]
    lines = []
    for i, p in enumerate(phon):
        t = np.arange(int(0.7 * 22050)) / 22050.0
        w = (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
             + 0.01 * rng.standard_normal(t.shape))
        name = f"utt{i}.wav"
        save_wav(wav_dir / name, w.astype(np.float32))
        lines.append(f'"{name}" "{p}"')
    labels = root / "labels.txt"
    labels.write_text("\n".join(lines) + "\n")
    return labels, wav_dir


def test_evaluate_cli_copy_synthesis(tmp_path, eval_corpus):
    """evaluate CLI end-to-end in metric-sanity mode: prediction := ground
    truth, so MCD and every DTW-aligned delta must be exactly ~0 and the
    JSON schema complete (VERDICT r3 #5; reference runner equivalent:
    utils/oversmoothing.py:524-632)."""
    from tts_arabic_tpu.apps import evaluate
    labels, wav_dir = eval_corpus
    out = tmp_path / "metrics.json"
    evaluate.main(["--labels", str(labels), "--wav-dir", str(wav_dir),
                   "--copy-synthesis", "--out", str(out)])
    report = json.loads(out.read_text())
    assert report["n_utterances"] == 3
    assert len(report["per_utterance"]) == 3
    agg = report["aggregate"]
    assert set(agg) and all(np.isfinite(v) for v in agg.values()), agg
    assert abs(agg["mcd"]) < 1e-6
    for r in report["per_utterance"]:
        assert r["mcd"] < 1e-6
        for k, v in r.items():
            if k.startswith(("mae_", "delta_u_")):
                assert abs(v) < 1e-6, (k, v)


def test_evaluate_cli_synthesizes_and_scores(tmp_path, eval_corpus,
                                             small_ckpt):
    """evaluate CLI full path: load checkpoint, synthesize the corpus
    transcripts, DTW-align vs ground-truth mels, aggregate finite
    metrics."""
    from tts_arabic_tpu.apps import evaluate
    labels, wav_dir = eval_corpus
    out = tmp_path / "metrics.json"
    evaluate.main(["--labels", str(labels), "--wav-dir", str(wav_dir),
                   "--checkpoint", str(small_ckpt), "--batch-size", "2",
                   "--out", str(out)])
    report = json.loads(out.read_text())
    assert report["n_utterances"] == 3
    agg = report["aggregate"]
    assert np.isfinite(agg["mcd"]) and agg["mcd"] > 0
    assert all(np.isfinite(v) for v in agg.values()), agg
