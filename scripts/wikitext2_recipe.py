"""WikiText-2 perplexity recipe (BASELINE.json:9 — the one environment-
blocked measurement: this box has ZERO egress and no local dataset copy,
re-checked every session. The machinery below runs END TO END the moment
either appears).

What it does, in order:
  1. locate WikiText-2 raw test text — --text FILE, a local HF cache, a
     `datasets` download (works when egress exists), or common paths;
  2. tokenize with the model's tokenizer (--tokenizer DIR);
  3. run quant_tpu.eval.perplexity for the checkpoint as-converted
     (INT4/INT8 per its config) AND a near-fp reference (bits=8,
     kv_bits=16) built from the same HF model via quantize --bits 8, if
     --ref-ckpt is given;
  4. print the relative ppl delta — the BASELINE gate is "within the
     same Δ as a reference weight-only baseline".

Example (the full config-3 measurement, once data exists):

    python -m quant_tpu convert  Llama-3-8B/ ckpt4/ --bits 4
    python -m quant_tpu convert  Llama-3-8B/ ckpt8/ --bits 8
    python scripts/wikitext2_recipe.py ckpt4/ --ref-ckpt ckpt8/ \
        --tokenizer Llama-3-8B/ [--text wiki.test.raw]
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

SEARCH_PATHS = [
    "/root/data/wikitext-2-raw/wiki.test.raw",
    "/root/data/wikitext-2/wiki.test.tokens",
    "/data/wikitext-2-raw/wiki.test.raw",
]


def find_text(args) -> str:
    if args.text:
        return pathlib.Path(args.text).read_text(errors="replace")
    for p in SEARCH_PATHS:
        if pathlib.Path(p).exists():
            print(f"found local dataset: {p}")
            return pathlib.Path(p).read_text(errors="replace")
    try:
        from datasets import load_dataset

        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
        return "\n".join(ds["text"])
    except Exception as e:
        raise SystemExit(
            "WikiText-2 not found: no --text file, no local copy "
            f"({SEARCH_PATHS}), and the hub fetch failed ({e!r} — this "
            "box has zero egress). Provide the raw test split via "
            "--text when data becomes available.")


def ppl_for(ckpt: str, toks, window: int, kv_bits: int | None):
    import dataclasses

    from quant_tpu.checkpoint import load_checkpoint
    from quant_tpu.eval import perplexity

    params, cfg = load_checkpoint(ckpt)
    if kv_bits:
        cfg = dataclasses.replace(cfg, kv_bits=kv_bits)
    return perplexity(params, cfg, toks, window=window), cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="quantized checkpoint under test")
    ap.add_argument("--ref-ckpt", default=None,
                    help="near-fp reference checkpoint (e.g. --bits 8 "
                         "conversion of the same model)")
    ap.add_argument("--tokenizer", required=True)
    ap.add_argument("--text", default=None,
                    help="raw WikiText-2 test text file")
    ap.add_argument("--window", type=int, default=512)
    args = ap.parse_args()

    text = find_text(args)
    from transformers import AutoTokenizer

    import numpy as np

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    toks = np.asarray(tok(text)["input_ids"], np.int32)
    print(f"tokens: {toks.size}")

    ours, cfg = ppl_for(args.ckpt, toks, args.window, None)
    out = {"ckpt": args.ckpt, "bits": cfg.bits, "kv_bits": cfg.kv_bits,
           "ppl": ours["ppl"], "nll": ours["nll"],
           "tokens": ours["tokens"]}
    if args.ref_ckpt:
        ref, _ = ppl_for(args.ref_ckpt, toks, args.window, 16)
        out["ref_ppl"] = ref["ppl"]
        out["rel_delta"] = abs(ours["ppl"] - ref["ppl"]) / ref["ppl"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
