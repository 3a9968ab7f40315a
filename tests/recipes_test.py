"""Dataset recipe tests on synthetic corpus trees (no real TIMIT/WSJ/LibriSpeech
on this machine; the directory layouts and file formats are reproduced)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from speech_tpu.utils.wave import write_wave

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples")


def _load(recipe, name):
    path = os.path.join(EXAMPLES, recipe, name + ".py")
    spec = importlib.util.spec_from_file_location(f"{recipe}_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    old = sys.path[:]
    sys.path.insert(0, os.path.dirname(path))
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path[:] = old
    return mod


timit = _load("timit", "preprocess")
wsj = _load("wsj", "preprocess")
librispeech = _load("librispeech", "preprocess")


def test_timit_phone_map():
    m60_48, m48_39 = timit.load_phone_map()
    assert m60_48["ax-h"] == "ax"
    assert m48_39["ax"] == "ah"
    assert "q" not in m60_48  # glottal stop dropped
    assert len(set(m60_48.values())) == 48
    assert len(set(m48_39.values())) == 39


def _make_timit_tree(root, speakers, utts_per_spk=2):
    sr = 16000
    for spk in speakers:
        d = os.path.join(root, "dr1", spk)
        os.makedirs(d, exist_ok=True)
        for i in range(utts_per_spk):
            stem = os.path.join(d, f"si{i}")
            with open(stem + ".phn", "w") as f:
                f.write("0 100 h#\n100 200 ax-h\n200 300 q\n300 400 aa\n")
            write_wave(stem + ".wv",
                       np.zeros(int(sr * 0.5), np.int16), sr)
            # an sa sentence that must be excluded
            sa = os.path.join(d, "sa1")
            with open(sa + ".phn", "w") as f:
                f.write("0 100 aa\n")
            write_wave(sa + ".wv", np.zeros(sr // 2, np.int16), sr)


def test_timit_transcripts_and_split(tmp_path):
    root = str(tmp_path / "test")
    speakers = timit.TEST_SPEAKERS[:3] + ["fabc0", "mxyz0"]
    _make_timit_tree(root, speakers)
    data = timit.load_transcripts(root)
    # 5 speakers x 2 utts, sa excluded
    assert len(data) == 10
    assert all("sa" not in os.path.basename(k) for k in data)
    # 61->48 mapping applied, q dropped
    assert list(data.values())[0] == ["sil", "ax", "aa"]
    dev, test = timit.split_by_speaker(data, dev_speakers=2, seed=1)
    test_speakers = {os.path.basename(os.path.dirname(k)) for k in test}
    assert test_speakers == set(timit.TEST_SPEAKERS[:3])
    dev_speakers = {os.path.basename(os.path.dirname(k)) for k in dev}
    assert dev_speakers == {"fabc0", "mxyz0"}
    # seeded: identical on re-run
    dev2, _ = timit.split_by_speaker(data, dev_speakers=2, seed=1)
    assert set(dev2) == set(dev)


def test_timit_build_json(tmp_path):
    root = str(tmp_path / "train")
    _make_timit_tree(root, ["fabc0"])
    data = timit.load_transcripts(root)
    timit.build_json(data, str(tmp_path), "train")
    rows = [json.loads(l) for l in open(tmp_path / "train.json")]
    assert len(rows) == 2
    assert rows[0]["text"] == ["sil", "ax", "aa"]
    assert rows[0]["duration"] == 0.5
    assert rows[0]["audio"].endswith(".wv")


@pytest.mark.parametrize("raw,expect", [
    # <...> loses only the brackets (reference semantics); (...) is dropped
    ("THE CAT <NOISE> SAT (ab)", "the cat noise sat"),
    ("HELLO .PERIOD WORLD", "hello period world"),
    ("A\\ B [loud] C", "a b c"),
    ("SELF-dash STYLED", "self dash styled"),
    ("QUOTE `single-quote END", "quote single-quote end"),
])
def test_wsj_clean(raw, expect):
    assert wsj.clean(raw) == expect


def test_wsj_load_waves_and_text(tmp_path):
    base = str(tmp_path)
    idx_dir = os.path.join(base, "wsj0/doc/indices/train")
    os.makedirs(idx_dir)
    os.makedirs(os.path.join(base, "wsj0/si_tr_s/011"))
    with open(os.path.join(idx_dir, "tr_s_wv1.ndx"), "w") as f:
        f.write("; comment line\n")
        f.write("11_1_1: /wsj0/si_tr_s/011/011c0201.wv1\n")
    waves = wsj.load_waves(base, ["wsj0/doc/indices/train/tr_s_wv1.ndx"])
    assert waves == [os.path.join(base, "wsj0/si_tr_s/011/011c0201.wav")]

    dot_dir = os.path.join(base, "wsj0/transcrp/dots/011/01")
    os.makedirs(dot_dir)
    with open(os.path.join(dot_dir, "a.dot"), "w") as f:
        f.write("THE QUICK FOX (011c0201)\n")
    text = wsj.load_text(base)
    assert text["011c0201"] == "the quick fox"


def test_wsj_native_sphere_manifest_end_to_end(tmp_path):
    """--native_sphere flow: the manifest points at the original
    embedded-shorten .wv1 SPHERE files and the loader stack reads them in
    place (utils/shorten.py) — no sph2pipe conversion pass."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from shn_ref_encoder import encode_shn

    base = str(tmp_path)
    idx_dir = os.path.join(base, "wsj0/doc/indices/train")
    spk_dir = os.path.join(base, "wsj0/si_tr_s/011")
    os.makedirs(idx_dir)
    os.makedirs(spk_dir)
    rng = np.random.default_rng(0)
    n = 4800
    samples = np.clip(rng.normal(0, 2000, n), -32768, 32767).astype(np.int64)
    payload = encode_shn(samples, blocksize=256, nmean=4)
    coding = "pcm,embedded-shorten-v2"
    header = (f"NIST_1A\n   1024\nsample_rate -i 16000\n"
              f"sample_count -i {n}\nchannel_count -i 1\n"
              f"sample_n_bytes -i 2\nsample_byte_format -s2 10\n"
              f"sample_coding -s{len(coding)} {coding}\nend_head\n")
    wv1 = os.path.join(spk_dir, "011c0201.wv1")
    with open(wv1, "wb") as f:
        f.write(header.encode().ljust(1024, b" ") + payload)
    with open(os.path.join(idx_dir, "tr_s_wv1.ndx"), "w") as f:
        f.write("11_1_1: /wsj0/si_tr_s/011/011c0201.wv1\n")

    waves = wsj.load_waves(base, ["wsj0/doc/indices/train/tr_s_wv1.ndx"],
                           ext=".wv1")
    assert waves == [wv1]
    out = str(tmp_path / "out")
    os.makedirs(out)
    wsj.write_json(out, "train_si284", waves, {"011c0201": "the quick fox"})
    with open(os.path.join(out, "train_si284.json")) as f:
        row = json.loads(f.readline())
    assert row["audio"] == wv1
    assert row["duration"] == pytest.approx(n / 16000)

    from speech_tpu.utils.wave import array_from_wave

    audio, rate = array_from_wave(wv1)
    assert rate == 16000
    np.testing.assert_array_equal(audio, samples.astype(np.int16))


def test_librispeech_tree(tmp_path):
    split = str(tmp_path / "LibriSpeech" / "dev-clean")
    d = os.path.join(split, "84", "121123")
    os.makedirs(d)
    with open(os.path.join(d, "84-121123.trans.txt"), "w") as f:
        f.write("84-121123-0000 HELLO WORLD\n84-121123-0001 SECOND LINE\n")
    sr = 16000
    # The real corpus ships FLAC; manifests point at it in place (the
    # reference converted to wav first — our pipeline decodes FLAC natively).
    from flac_ref_encoder import encode_flac

    for utt in ["84-121123-0000", "84-121123-0001"]:
        with open(os.path.join(d, utt + ".flac"), "wb") as f:
            f.write(encode_flac(np.zeros(sr, np.int64), sr, mode="constant"))
    out = librispeech.build_json(split)
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 2
    assert rows[0]["text"] == "hello world"
    assert rows[0]["duration"] == 1.0
    assert os.path.exists(rows[0]["audio"])
    assert rows[0]["audio"].endswith(".flac")
    assert librispeech.path_from_key("84-121123-0000", split, "wav").endswith(
        "84/121123/84-121123-0000.wav")

    # --convert_wav keeps the reference's wav flow.
    for utt in ["84-121123-0000", "84-121123-0001"]:
        write_wave(os.path.join(d, utt + ".wav"),
                   np.zeros(sr, np.int16), sr)
    out = librispeech.build_json(split, ext="wav")
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 2 and rows[0]["audio"].endswith(".wav")
