"""CLI (SURVEY.md §2.2 #18): convert / generate / bench / eval / selftest.

    python -m quant_tpu convert  <hf_dir> <out_dir> --bits 4 --group-size 128
    python -m quant_tpu generate <ckpt_dir> --prompt-ids 1,2,3 --max-new 32
    python -m quant_tpu bench    [--preset llama-3-8b] [--layers 4]
    python -m quant_tpu eval     <ckpt_dir> --text file.txt [--tokenizer dir]
    python -m quant_tpu selftest
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_convert(args):
    import numpy as np

    from quant_tpu.checkpoint import convert_hf_llama

    calib = None
    if args.algo != "rtn":
        if args.calib:
            calib = np.load(args.calib)
        else:
            raise SystemExit(
                f"--algo {args.algo} needs --calib <tokens.npy> "
                "([B, T] int ids of real text; calibration minimizes "
                "layer-output error on that sample)")
    cfg = convert_hf_llama(
        args.hf_dir, args.out_dir, bits=args.bits,
        group_size=args.group_size, tp=args.tp, algo=args.algo,
        calib_tokens=calib, codebook=args.codebook,
    )
    print(json.dumps({"converted": args.out_dir, "algo": args.algo,
                      "config": cfg.__dict__}))


def _parse_mesh(spec: str):
    """'data=2,model=4[,pipe=2][,seq=2][,expert=2]' → jax.sharding.Mesh."""
    from quant_tpu.parallel import make_mesh

    kw = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        kw[k.strip()] = int(v)
    return make_mesh(**kw)


def _cmd_generate(args):
    from quant_tpu.checkpoint import load_checkpoint
    from quant_tpu.engine import Engine, SamplingConfig

    import dataclasses

    mesh = _parse_mesh(args.mesh) if args.mesh else None
    params, cfg = load_checkpoint(args.ckpt, mesh=mesh,
                              lut_runtime=getattr(
                                  args, "lut_runtime", None))
    if args.kv_bits:
        cfg = dataclasses.replace(cfg, kv_bits=args.kv_bits)
    if getattr(args, "moe_prefill", None):
        cfg = dataclasses.replace(cfg, moe_prefill=args.moe_prefill)
    if getattr(args, "moe_routed", None):
        cfg = dataclasses.replace(cfg, moe_routed=args.moe_routed)
    tok = None
    if args.tokenizer:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer)
    loras = None
    if getattr(args, "lora", None):
        from quant_tpu.models.lora import load_hf_adapter

        loras = {}
        for spec in args.lora:
            name, _, path = spec.partition("=")
            if not path:
                raise SystemExit("--lora expects name=/path/to/adapter")
            loras[name] = load_hf_adapter(path)
    eng = Engine(params, cfg, max_slots=args.slots, max_seq=args.max_seq,
                 eos_id=(tok.eos_token_id if tok and args.eos_id == 2
                         else args.eos_id),
                 mesh=mesh, pp_micro=args.pp_micro, loras=loras)
    if args.prompt is not None:
        if tok is None:
            raise SystemExit("--prompt requires --tokenizer")
        prompts = [tok(p)["input_ids"] for p in args.prompt]
    else:
        prompts = [
            [int(t) for t in p.split(",")]
            for p in args.prompt_ids.split(";")
        ]
    fsm = None
    if getattr(args, "guided_regex", None):
        from quant_tpu.engine.grammar import regex_fsm, vocab_bytes
        if tok is None:
            raise SystemExit("--guided-regex requires --tokenizer")
        fsm = regex_fsm(args.guided_regex,
                        vocab_bytes(tok, cfg.vocab_size), eng.eos_id)
    outs = eng.generate(
        prompts, max_new_tokens=args.max_new, fsm=fsm,
        lora=(args.use_lora if getattr(args, "use_lora", None)
              else None),
        sampling=SamplingConfig(
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, min_p=args.min_p,
            repetition_penalty=args.repetition_penalty,
            frequency_penalty=args.frequency_penalty,
            presence_penalty=args.presence_penalty,
            logit_bias=tuple(
                (int(t), float(v)) for t, v in
                (pair.split(":") for pair in
                 args.logit_bias.split(","))) if args.logit_bias else ()),
    )
    for p, o in zip(prompts, outs):
        rec = {"prompt": p, "output": o}
        if tok is not None:
            rec["text"] = tok.decode(o)
        print(json.dumps(rec))
    print(json.dumps({"stats": eng.stats}), file=sys.stderr)


def _cmd_bench(args):
    import bench

    bench.main()


def _cmd_eval(args):
    import dataclasses

    from quant_tpu.checkpoint import load_checkpoint
    from quant_tpu.eval import perplexity
    from quant_tpu.eval.perplexity import tokens_from_file

    params, cfg = load_checkpoint(args.ckpt)
    if args.kv_bits:
        cfg = dataclasses.replace(cfg, kv_bits=args.kv_bits)
    if getattr(args, "moe_prefill", None):
        cfg = dataclasses.replace(cfg, moe_prefill=args.moe_prefill)
    if getattr(args, "moe_routed", None):
        cfg = dataclasses.replace(cfg, moe_routed=args.moe_routed)
    toks = tokens_from_file(args.text, args.tokenizer)
    res = perplexity(params, cfg, toks, window=args.window,
                     limit_windows=args.limit_windows)
    print(json.dumps(res))


def _cmd_serve(args):
    from quant_tpu.checkpoint import load_checkpoint
    from quant_tpu.engine import Engine
    from quant_tpu.engine.server import serve

    import dataclasses

    mesh = _parse_mesh(args.mesh) if args.mesh else None
    params, cfg = load_checkpoint(args.ckpt, mesh=mesh,
                              lut_runtime=getattr(
                                  args, "lut_runtime", None))
    if args.kv_bits:
        cfg = dataclasses.replace(cfg, kv_bits=args.kv_bits)
    if getattr(args, "moe_prefill", None):
        cfg = dataclasses.replace(cfg, moe_prefill=args.moe_prefill)
    if getattr(args, "moe_routed", None):
        cfg = dataclasses.replace(cfg, moe_routed=args.moe_routed)
    proposer = None
    if args.draft_ckpt:
        if not args.spec_gamma:
            raise SystemExit("--draft-ckpt requires --spec-gamma > 0")
        from quant_tpu.engine.spec import DraftModelProposer

        d_params, d_cfg = load_checkpoint(args.draft_ckpt)
        if d_cfg.vocab_size != cfg.vocab_size:
            raise SystemExit(
                f"draft vocab {d_cfg.vocab_size} != target "
                f"{cfg.vocab_size} (same tokenizer required)")
        proposer = DraftModelProposer(
            d_params, d_cfg, gamma=args.spec_gamma,
            max_slots=args.slots, max_seq=args.max_seq)
    loras = None
    if getattr(args, "lora", None):
        from quant_tpu.models.lora import load_hf_adapter

        loras = {}
        for spec in args.lora:
            name, _, path = spec.partition("=")
            if not path:
                raise SystemExit("--lora expects name=/path/to/adapter")
            loras[name] = load_hf_adapter(path)
    eng = Engine(params, cfg, max_slots=args.slots, max_seq=args.max_seq,
                 eos_id=args.eos_id, paged=args.paged,
                 page_size=args.page_size, n_pages=args.n_pages,
                 spec_gamma=args.spec_gamma, spec_proposer=proposer,
                 mesh=mesh, pp_micro=args.pp_micro,
                 max_pending=args.max_pending,
                 prefix_cache=args.prefix_cache, loras=loras,
                 sp_prefill_mode=args.sp_prefill,
                 sp_prefill_threshold=args.sp_threshold)
    tok = None
    if args.tokenizer:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer)
    serve(eng, host=args.host, port=args.port, tokenizer=tok,
          model_name=args.served_name or args.ckpt)


def _qrf1_encode(x, bits: int) -> bytes:
    """Float32 array → QRF1 container (the C++ CLI's file format:
    'QRF1' | u8 bits | f32 per-tensor scale | u64 n | QREF entropy frame
    of the byte/nibble-packed codes) — byte-compatible with
    cpp/quantref_cli.cpp cmd_encode, so files interop both ways."""
    import struct

    import numpy as np

    from quant_tpu.core import codec, entropy

    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    codes, scale = codec.quantize(x, bits)
    payload = (codec.pack_int4(codes) if bits == 4
               else codes.view(np.uint8))
    frame = entropy.encode(payload)
    return (b"QRF1" + struct.pack("<Bf", bits, float(scale))
            + struct.pack("<Q", x.size) + frame)


def _qrf1_decode(blob: bytes):
    import struct

    import numpy as np

    from quant_tpu.core import codec, entropy

    if len(blob) < 17 or blob[:4] != b"QRF1":
        raise ValueError("not a QRF1 file")
    bits, scale = struct.unpack("<Bf", blob[4:9])
    (n,) = struct.unpack("<Q", blob[9:17])
    payload = np.frombuffer(entropy.decode(blob[17:]), np.uint8)
    codes = (codec.unpack_int4(payload, n) if bits == 4
             else payload.view(np.int8)[:n])
    return codec.dequantize(codes, np.float32(scale)), codes, scale, bits


def _read_floats(path):
    import numpy as np

    if str(path).endswith(".npy"):
        return np.load(path).astype(np.float32).reshape(-1)
    return np.fromfile(path, np.float32)


def _cmd_encode(args):
    """File-level codec round trip (the reference CLI's own UX,
    SURVEY §0.1): raw .f32 / .npy floats → QRF1."""
    import pathlib

    x = _read_floats(args.infile)
    blob = _qrf1_encode(x, args.bits)
    pathlib.Path(args.outfile).write_bytes(blob)
    print(json.dumps({
        "n": int(x.size), "bits": args.bits, "bytes": len(blob),
        "ratio": round(4.0 * x.size / len(blob), 4),
    }))


def _cmd_decode(args):
    import pathlib

    recon, _, _, bits = _qrf1_decode(
        pathlib.Path(args.infile).read_bytes())
    recon.astype("float32").tofile(args.outfile)
    print(json.dumps({"n": int(recon.size), "bits": int(bits)}))


def _cmd_roundtrip(args):
    """encode → decode in memory; prints codes CRC + MSE (mirrors the
    C++ CLI's roundtrip report for cross-checking)."""
    import zlib

    import numpy as np

    x = _read_floats(args.infile)
    blob = _qrf1_encode(x, args.bits)
    recon, codes, scale, _ = _qrf1_decode(blob)
    mse = float(np.mean((x - recon.astype(np.float32)) ** 2))
    print(json.dumps({
        "n": int(x.size), "bits": args.bits, "scale": float(scale),
        "codes_crc32": zlib.crc32(codes.tobytes()) & 0xFFFFFFFF,
        "mse": mse, "delta_bound": float((scale / 2) ** 2),
        "ok": mse <= (scale / 2) ** 2,
    }))
    return 0 if mse <= (scale / 2) ** 2 else 1


def _cmd_selftest(args):
    """Codec bit-exactness vs the C++ oracle + a tiny e2e generate."""
    import numpy as np

    from quant_tpu.core import codec, oracle
    from quant_tpu.engine import Engine
    from quant_tpu.models import PRESETS, llama

    rng = np.random.default_rng(0)
    x = rng.standard_normal(1 << 20).astype(np.float32)  # 1M floats [B:7]
    ok = True
    if oracle.available():
        c_codes, c_scale = oracle.quantize(x, 8)
        p_codes, p_scale = codec.quantize(x, 8)
        ok &= bool(np.array_equal(c_codes, p_codes))
        ok &= c_scale == float(p_scale)
        rec = oracle.dequantize(c_codes, c_scale)
        mse = oracle.mse(x, rec)
        delta = (c_scale / 2) ** 2  # uniform-quantization MSE bound
        ok &= mse <= delta
        print(json.dumps({"oracle": True, "codes_bit_exact": ok,
                          "mse": mse, "delta_bound": delta}))
    else:
        print(json.dumps({"oracle": False}))

    cfg = PRESETS["test-tiny"]
    eng = Engine(llama.init_params(cfg, seed=0), cfg, max_slots=2,
                 max_seq=32, eos_id=-1)
    outs = eng.generate([[1, 2, 3]], max_new_tokens=4)
    ok &= len(outs[0]) == 4
    print(json.dumps({"e2e_generate": len(outs[0]) == 4, "ok": ok}))
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser(prog="quant_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="HF dir -> packed quantized ckpt")
    c.add_argument("hf_dir")
    c.add_argument("out_dir")
    c.add_argument("--bits", type=int, default=4)
    c.add_argument("--group-size", type=int, default=128)
    c.add_argument("--tp", type=int, default=1)
    c.add_argument("--codebook", default=None, choices=["nf4", "lloyd"],
                   help="non-uniform bin-lookup weight quantization "
                        "(int4-only; rtn algo): nf4 constants or a "
                        "per-tensor Lloyd-Max fit")
    c.add_argument("--algo",
                   choices=("rtn", "gptq", "awq", "awq+gptq"),
                   default="rtn",
                   help="rtn: round-to-nearest (codec default); gptq: "
                        "error-compensated calibration; awq: "
                        "activation-aware scale folding; awq+gptq: "
                        "both (all but rtn need --calib)")
    c.add_argument("--calib",
                   help=".npy of [B, T] int token ids for --algo gptq")
    c.set_defaults(fn=_cmd_convert)

    g = sub.add_parser("generate", help="generate from a packed ckpt")
    g.add_argument("ckpt")
    g.add_argument("--prompt-ids",
                   help="comma-separated ids; ';' separates prompts")
    g.add_argument("--prompt", action="append",
                   help="text prompt (repeatable); needs --tokenizer")
    g.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir for text prompts/decoding")
    g.add_argument("--max-new", type=int, default=32)
    g.add_argument("--max-seq", type=int, default=1024)
    g.add_argument("--slots", type=int, default=8)
    g.add_argument("--eos-id", type=int, default=2)
    g.add_argument("--temperature", type=float, default=0.0)
    g.add_argument("--top-k", type=int, default=0)
    g.add_argument("--top-p", type=float, default=1.0)
    g.add_argument("--min-p", type=float, default=0.0)
    g.add_argument("--repetition-penalty", type=float, default=1.0)
    g.add_argument("--frequency-penalty", type=float, default=0.0)
    g.add_argument("--presence-penalty", type=float, default=0.0)
    g.add_argument("--logit-bias", default=None,
                   help="comma list of token:bias, e.g. '13:-100,42:5'")
    g.add_argument("--guided-regex", default=None,
                   help="constrain the output to this regex "
                        "(device-resident token FSM; needs --tokenizer)")
    g.add_argument("--lora", action="append", default=None,
                   metavar="NAME=PATH",
                   help="register a HF PEFT adapter dir (repeatable)")
    g.add_argument("--use-lora", default=None,
                   help="generate with this registered adapter")
    g.add_argument("--moe-prefill", default=None,
                   choices=("dense", "capacity"),
                   help="MoE high-load dispatch: exact dense-all "
                        "(default) or GShard-style capacity (fused "
                        "grouped-GEMM gather past tokens*k >= 2E, "
                        "prefill AND high-batch decode; capacity-drop "
                        "semantics)")
    g.add_argument("--moe-routed", default=None,
                   choices=("auto", "on", "off"),
                   help="routed-hot MoE decode (bucketed hot-slot "
                        "grids): auto gates on expected coverage < 7/8 "
                        "(default), on/off force it")
    g.add_argument("--kv-bits", type=int, default=0, choices=(0, 4, 8, 16),
                   help="KV cache quantization override (0 = checkpoint "
                        "default): 4 int4 packed, 8 int8, 16 off")
    g.add_argument("--lut-runtime", default=None,
                   choices=["int8", "word4", "sel15"],
                   help="codebook checkpoint execution: int8 = one-time "
                        "transcode at load (default, linear-kernel "
                        "speed), word4/sel15 = in-kernel table gather")
    g.add_argument("--mesh", default=None,
                   help="multi-chip mesh, e.g. 'data=2,model=4', 'expert=4' or "
                        "'pipe=2,model=4' (axes: pipe,data,model,seq)")
    g.add_argument("--pp-micro", type=int, default=1,
                   help="pipeline microbatches (with pipe>1 meshes)")
    g.set_defaults(fn=_cmd_generate)

    b = sub.add_parser("bench", help="roofline bench (one JSON line)")
    b.set_defaults(fn=_cmd_bench)

    e = sub.add_parser("eval", help="perplexity on a text file")
    e.add_argument("ckpt")
    e.add_argument("--text", required=True)
    e.add_argument("--tokenizer", default=None)
    e.add_argument("--window", type=int, default=512)
    e.add_argument("--kv-bits", type=int, default=0, choices=(0, 4, 8, 16),
                   help="KV quantization override for the eval run")
    e.add_argument("--limit-windows", type=int, default=None)
    e.set_defaults(fn=_cmd_eval)

    sv = sub.add_parser("serve", help="HTTP serving frontend")
    sv.add_argument("ckpt")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8400)
    sv.add_argument("--tokenizer", default=None,
                    help="HF tokenizer dir: enables text prompts and "
                         "/v1/chat/completions on the OpenAI surface")
    sv.add_argument("--served-name", default=None,
                    help="model id reported by /v1/models "
                         "(default: the ckpt path)")
    sv.add_argument("--slots", type=int, default=8)
    sv.add_argument("--max-seq", type=int, default=1024)
    sv.add_argument("--eos-id", type=int, default=2)
    sv.add_argument("--paged", action="store_true",
                    help="paged KV pool (HBM bounded by allocated pages; "
                         "enables preemption + oversubscription)")
    sv.add_argument("--page-size", type=int, default=None)  # None: engine picks (512 when max_seq allows)
    sv.add_argument("--n-pages", type=int, default=None,
                    help="pool pages (default: full slots*max_seq capacity)")
    sv.add_argument("--spec-gamma", type=int, default=0,
                    help="speculative decoding draft length (0 = off); "
                         "n-gram prompt-lookup drafts, greedy slots only")
    sv.add_argument("--prefix-cache", action="store_true",
                    help="automatic prompt-prefix page sharing "
                         "(requires --paged; composes with data/model meshes)")
    sv.add_argument("--max-pending", type=int, default=None,
                    help="admission queue cap (HTTP 429 beyond it)")
    sv.add_argument("--lora", action="append", default=None,
                    metavar="NAME=PATH",
                    help="register a HF PEFT LoRA adapter dir under "
                         "NAME (repeatable); requests select via "
                         "'lora' or the OpenAI 'model' field")
    sv.add_argument("--moe-prefill", default=None,
                    choices=("dense", "capacity"))
    sv.add_argument("--moe-routed", default=None,
                    choices=("auto", "on", "off"))
    sv.add_argument("--kv-bits", type=int, default=0,
                    choices=(0, 4, 8, 16),
                    help="KV cache quantization override (0 = checkpoint "
                         "default): 4 int4 packed, 8 int8, 16 off")
    sv.add_argument("--lut-runtime", default=None,
                    choices=["int8", "word4", "sel15"],
                    help="codebook checkpoint execution mode "
                         "(see generate --lut-runtime)")
    sv.add_argument("--mesh", default=None,
                    help="multi-chip mesh, e.g. 'data=2,model=4', 'expert=4' or "
                         "'pipe=2,model=4' (axes: pipe,data,model,seq)")
    sv.add_argument("--sp-prefill", default="ring",
                    choices=["ring", "ulysses"],
                    help="q-sharded prefill mode for seq>1 meshes")
    sv.add_argument("--sp-threshold", type=int, default=None,
                    help="prompt length above which the body admits via "
                         "the q-sharded SP prefill (seq>1 meshes)")
    sv.add_argument("--pp-micro", type=int, default=1,
                    help="pipeline microbatches (with pipe>1 meshes)")
    sv.add_argument("--draft-ckpt", default=None,
                    help="packed checkpoint of a small same-tokenizer "
                         "draft model: use draft-MODEL speculative "
                         "decoding instead of n-gram lookup "
                         "(greedy-only; requires --spec-gamma)")
    sv.set_defaults(fn=_cmd_serve)

    s = sub.add_parser("selftest", help="oracle bit-exactness + e2e smoke")
    s.set_defaults(fn=_cmd_selftest)

    en = sub.add_parser("encode", help="floats (.f32/.npy) -> QRF1 codec "
                                       "file (C++-CLI-compatible)")
    en.add_argument("infile")
    en.add_argument("outfile")
    en.add_argument("--bits", type=int, default=8, choices=(4, 8))
    en.set_defaults(fn=_cmd_encode)

    de = sub.add_parser("decode", help="QRF1 file -> raw .f32 floats")
    de.add_argument("infile")
    de.add_argument("outfile")
    de.set_defaults(fn=_cmd_decode)

    rt = sub.add_parser("roundtrip", help="encode+decode in memory; "
                                          "prints codes CRC32 + MSE")
    rt.add_argument("infile")
    rt.add_argument("--bits", type=int, default=8, choices=(4, 8))
    rt.set_defaults(fn=_cmd_roundtrip)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
