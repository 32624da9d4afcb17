"""CLI + perplexity tests (CPU; drives the public command surface)."""

import json

import numpy as np
import pytest

from quant_tpu import cli
from quant_tpu.eval import perplexity
from quant_tpu.models import PRESETS, llama

CFG = PRESETS["test-tiny"]


def test_perplexity_runs_and_is_sane():
    params = llama.init_params(CFG, seed=0)
    toks = np.random.default_rng(0).integers(0, CFG.vocab_size, 200)
    res = perplexity(params, CFG, toks, window=64)
    assert res["tokens"] == 3 * 64
    # random model on random tokens → ppl near vocab size, far from 1
    assert 10 < res["ppl"] < CFG.vocab_size * 10


def test_perplexity_lower_on_model_generated_stream():
    """A greedy self-generated continuation is (near-)argmax at every step,
    so its NLL must be far below a random stream's."""
    from quant_tpu.engine import Engine

    params = llama.init_params(CFG, seed=0)
    eng = Engine(params, CFG, max_slots=1, max_seq=128, eos_id=-1)
    gen = eng.generate([[1, 2, 3]], max_new_tokens=120)[0]
    stream = np.asarray([1, 2, 3] + gen, np.int32)
    rand = np.random.default_rng(0).integers(0, CFG.vocab_size, stream.size)
    r_gen = perplexity(params, CFG, stream, window=64)
    r_rand = perplexity(params, CFG, rand, window=64)
    assert r_gen["ppl"] < r_rand["ppl"] / 2


def test_cli_convert_generate_eval(tmp_path, capsys):
    from tests.test_checkpoint import _write_fake_hf

    hf = tmp_path / "hf"
    _write_fake_hf(hf, CFG)
    rc = cli.main([
        "convert", str(hf), str(tmp_path / "ckpt"), "--bits", "4",
        "--group-size", "64",
    ])
    assert rc is None
    out = capsys.readouterr().out
    assert json.loads(out.splitlines()[-1])["converted"]

    cli.main([
        "generate", str(tmp_path / "ckpt"), "--prompt-ids", "1,2,3;4,5",
        "--max-new", "3", "--max-seq", "32", "--eos-id", "-1",
    ])
    lines = capsys.readouterr().out.strip().splitlines()
    outs = [json.loads(l) for l in lines]
    assert len(outs) == 2 and all(len(o["output"]) == 3 for o in outs)

    text = tmp_path / "t.txt"
    text.write_text("hello world " * 40)
    cli.main([
        "eval", str(tmp_path / "ckpt"), "--text", str(text),
        "--window", "64", "--limit-windows", "2",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["ppl"] > 1.0


def test_cli_generate_mesh(tmp_path, capsys):
    """--mesh drives the multi-chip engine end-to-end from the CLI:
    output must match the single-device CLI run exactly."""
    from tests.test_checkpoint import _write_fake_hf

    hf = tmp_path / "hf"
    _write_fake_hf(hf, CFG)
    cli.main([
        "convert", str(hf), str(tmp_path / "ckpt"), "--bits", "4",
        "--group-size", "64", "--tp", "2",
    ])
    capsys.readouterr()

    base_args = [
        "generate", str(tmp_path / "ckpt"), "--prompt-ids", "1,2,3;4,5",
        "--max-new", "4", "--max-seq", "32", "--eos-id", "-1",
    ]
    cli.main(base_args)
    single = [json.loads(l)
              for l in capsys.readouterr().out.strip().splitlines()]
    cli.main(base_args + ["--mesh", "data=2,model=2"])
    meshed = [json.loads(l)
              for l in capsys.readouterr().out.strip().splitlines()]
    assert [o["output"] for o in meshed] == [o["output"] for o in single]


def test_cli_selftest(capsys):
    rc = cli.main(["selftest"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1])["ok"]


def test_cli_codec_file_roundtrip(tmp_path):
    """encode/decode/roundtrip subcommands (the reference CLI's own UX):
    QRF1 file round trip reconstructs within the uniform-quantization MSE
    bound, bits in {4, 8}."""
    import numpy as np

    from quant_tpu.cli import main

    x = np.random.default_rng(0).standard_normal(100_003).astype(np.float32)
    raw = tmp_path / "in.f32"
    x.tofile(raw)
    for bits in (8, 4):
        out = tmp_path / f"c{bits}.qref"
        dec = tmp_path / f"d{bits}.f32"
        assert main(["encode", str(raw), str(out), "--bits", str(bits)]) in (
            0, None)
        assert main(["decode", str(out), str(dec)]) in (0, None)
        recon = np.fromfile(dec, np.float32)
        assert recon.shape == x.shape
        scale = np.abs(x).max() / (2 ** (bits - 1) - 1)
        mse = float(np.mean((x - recon) ** 2))
        assert mse <= (scale / 2) ** 2, (bits, mse)
        assert main(["roundtrip", str(raw), "--bits", str(bits)]) in (0, None)


def test_cli_codec_interops_with_cpp_cli(tmp_path):
    """Python-written QRF1 files decode through the C++ reference CLI and
    vice versa, bit-identically on the payload (the at-rest contract)."""
    import pathlib
    import subprocess

    import numpy as np

    from quant_tpu.cli import main

    exe = pathlib.Path(__file__).resolve().parents[1] / "cpp/build/quantref"
    if not exe.exists():
        pytest.skip("C++ CLI not built")
    x = np.random.default_rng(1).standard_normal(65_537).astype(np.float32)
    raw = tmp_path / "in.f32"
    x.tofile(raw)
    for bits in (8, 4):
        py_q = tmp_path / f"py{bits}.qref"
        main(["encode", str(raw), str(py_q), "--bits", str(bits)])
        cc_q = tmp_path / f"cc{bits}.qref"
        subprocess.run([str(exe), "encode", str(raw), str(cc_q),
                        "--bits", str(bits)], check=True,
                       capture_output=True)
        # identical containers byte-for-byte (same codec, same entropy
        # tables, same packing)
        assert py_q.read_bytes() == cc_q.read_bytes(), bits
        # C++ decodes the Python file; Python decodes the C++ file
        cc_out = tmp_path / f"cc{bits}.f32"
        subprocess.run([str(exe), "decode", str(py_q), str(cc_out)],
                       check=True, capture_output=True)
        py_out = tmp_path / f"py{bits}.f32"
        main(["decode", str(cc_q), str(py_out)])
        np.testing.assert_array_equal(np.fromfile(cc_out, np.float32),
                                      np.fromfile(py_out, np.float32))
