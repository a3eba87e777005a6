"""LM generation benchmark (mirror of the reference's
`mamba-1p1p1/benchmarks/benchmark_generation_mamba_simple.py`).

  python benchmarks/benchmark_generation.py --d_model 768 --n_layer 24 \
      --promptlen 100 --genlen 100 --batch 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d_model", type=int, default=768)
    p.add_argument("--n_layer", type=int, default=24)
    p.add_argument("--vocab", type=int, default=50277)
    p.add_argument("--promptlen", type=int, default=100)
    p.add_argument("--genlen", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    # full reference sampling surface (benchmark_generation_mamba_simple
    # .py:15-18): temperature / topk / topp / repetition-penalty
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--topk", type=int, default=1)
    p.add_argument("--topp", type=float, default=1.0)
    p.add_argument("--repetition_penalty", type=float, default=1.0)
    args = p.parse_args()

    from fastvim_tpu.models.lm import MambaLMHeadModel, generate

    model = MambaLMHeadModel(vocab_size=args.vocab, d_model=args.d_model,
                             n_layer=args.n_layer, dtype=jnp.bfloat16)
    prompt = jnp.ones((args.batch, args.promptlen), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)

    # Relay-safe timing (see bench.py): block_until_ready does not block
    # through the remote-execution relay, so force a host transfer
    # (int() of one element) and DIFFERENCE two generation lengths —
    # prefill cost and the host↔device round trip cancel, leaving pure
    # steady-state decode time. generate() is one jit program per
    # genlen (fused prefill + lax.scan decode loop).
    def run(genlen):
        out = generate(model, params, prompt, max_new_tokens=genlen,
                       temperature=args.temperature, top_k=args.topk,
                       top_p=args.topp,
                       repetition_penalty=args.repetition_penalty)
        return int(out[0, -1])

    n1, n2 = args.genlen, args.genlen * 3
    run(n1)  # compile
    run(n2)

    def timed(genlen):
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run(genlen)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = timed(n2) - timed(n1)
    toks = args.batch * (n2 - n1)
    print(json.dumps({
        "metric": "mamba_lm_decode_tokens_per_sec",
        "value": round(toks / dt, 1),
        "unit": "tokens/sec",
        "batch": args.batch, "promptlen": args.promptlen,
        "genlen_diff": n2 - n1, "seconds": round(dt, 3),
        "per_token_ms": round(1e3 * dt / (n2 - n1), 3),
    }))


if __name__ == "__main__":
    main()
