"""Roofline attribution of the JETS serving graph from its optimized HLO.

VERDICT r2 item 3 asks for a trace-backed analysis naming the top time
sinks of the JETS text->waveform graph. `jax.profiler` device traces are
not collectable through the axon remote-TPU runtime, so this tool derives
the attribution from the compiled artifact instead: it parses the
post-optimization HLO text (shapes are inlined, `metadata={op_name=...}`
carries the flax module path), estimates per-instruction FLOPs and HBM
bytes, and ranks module-level buckets by a v5e roofline time lower bound

    t_op >= max(flops / PEAK_FLOPS, bytes / HBM_BW)

Usage:
    python tools/jets_hlo_analysis.py            # real chip (or default backend)
    JAX_PLATFORMS=cpu python tools/jets_hlo_analysis.py   # parser smoke

Prints a per-subsystem table and the top-15 single instructions; writes
nothing. The conclusions live in PERF_NOTES.md.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# v5e (1 chip): bf16 MXU peak and HBM bandwidth
PEAK_FLOPS = 197e12
HBM_BW = 819e9

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([\d,]*)\]")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def shape_bytes(dtype: str, dims) -> int:
    n = 1
    for d in dims:
        n *= d
    return n * DTYPE_BYTES.get(dtype, 4)


def parse_shapes(text: str):
    """All dtype[dims] shapes appearing in an instruction line."""
    out = []
    for dtype, dims in _SHAPE_RE.findall(text):
        dims = [int(d) for d in dims.split(",") if d] if dims else []
        out.append((dtype, dims))
    return out


def _operand_shapes(line: str, op: str, defs=None):
    """[output_shape, operand shapes...] for an instruction line. Inside
    fused computations operand shapes are not inlined, so unresolved %name
    references fall back to the global ``defs`` name->shape map."""
    shapes = parse_shapes(line.split(f" {op}(")[0])
    out_s = shapes[0] if shapes else None
    m = re.search(rf" {op}\(([^)]*)\)", line)
    ops = []
    if m:
        for tok in m.group(1).split(","):
            tok = tok.strip()
            ts = parse_shapes(tok)
            if ts:
                ops.append(ts[0])
            elif defs is not None:
                name = tok.lstrip("%").split(" ")[0]
                if name in defs:
                    ops.append(defs[name])
    return [out_s] + ops if out_s else []


def build_defs(hlo_text: str):
    """Global %name -> (dtype, dims) map over every instruction/param."""
    defs = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+([a-z]+\d*)\[([\d,]*)\]", s)
        if m:
            dims = [int(d) for d in m.group(3).split(",") if d]
            defs[m.group(1)] = (m.group(2), dims)
        # computation header params: name: dtype[dims]
        for pm in re.finditer(r"([\w.\-]+):\s+([a-z]+\d*)\[([\d,]*)\]", s):
            dims = [int(d) for d in pm.group(3).split(",") if d]
            defs.setdefault(pm.group(1), (pm.group(2), dims))
    return defs


def conv_flops(line: str, defs=None) -> float:
    """2 * out_elems * (kernel_spatial * Cin / groups) from shapes.

    HLO text: %x = TY[out]{..} convolution(TY[in]{..} %a, TY[k]{..} %b),
    window=..., dim_labels=b0f_0io->b0f ...
    """
    shapes = _operand_shapes(line, "convolution", defs)
    if len(shapes) < 3:
        return 0.0
    out_s, in_s, k_s = shapes[0], shapes[1], shapes[2]
    m = re.search(r"dim_labels=([^\s,]+)", line)
    groups = 1
    gm = re.search(r"feature_group_count=(\d+)", line)
    if gm:
        groups = int(gm.group(1))
    out_elems = 1
    for d in out_s[1]:
        out_elems *= d
    if m:
        labels = m.group(1)
        lhs, rhs = labels.split("->")[0].split("_")
        # kernel dims: spatial are the digits, i=input features, o=output
        k_spatial = 1
        cin = 1
        for ch, d in zip(rhs, k_s[1]):
            if ch.isdigit():
                k_spatial *= d
            elif ch == "i":
                cin = d
        # base dilation inserts zeros into the lhs: only ~1/prod(lhs_dilate)
        # of the window taps hit data (the TPU backend lowers batched
        # einsums/transposed convs this way), so count algorithmic flops
        dm = re.search(r"lhs_dilate=([x\d]+)", line)
        if dm:
            dil = 1
            for d in dm.group(1).split("x"):
                dil *= max(int(d), 1)
            k_spatial = max(k_spatial // dil, 1)
        return 2.0 * out_elems * k_spatial * cin / max(groups, 1) * groups
    return 0.0


def dot_flops(line: str, defs=None) -> float:
    shapes = _operand_shapes(line, "dot", defs)
    if len(shapes) < 3:
        return 0.0
    out_s, lhs_s, rhs_s = shapes[0], shapes[1], shapes[2]
    out_elems = 1
    for d in out_s[1]:
        out_elems *= d
    # contracted size = lhs elems / (out elems from lhs side); use the
    # declared contracting dims when present
    m = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    k = 1
    if m and lhs_s[1]:
        for i in [int(x) for x in m.group(1).split(",") if x]:
            if i < len(lhs_s[1]):
                k *= lhs_s[1][i]
    return 2.0 * out_elems * k


def bucket_of(op_name: str) -> str:
    """Map a flax op_name path to a coarse subsystem bucket."""
    n = op_name.lower()
    for key, bucket in (
        ("hifigan", "vocoder(hifigan)"),
        ("generator", "vocoder(hifigan)"),
        ("upsample", "vocoder(hifigan)"),
        ("mrf", "vocoder(hifigan)"),
        ("mas", "alignment(mas)"),
        ("viterbi", "alignment(mas)"),
        ("monotonic", "alignment(mas)"),
        ("forward_sum", "align-loss(ctc)"),
        ("ctc", "align-loss(ctc)"),
        ("aligner", "alignment"),
        ("alignment", "alignment"),
        ("adamw", "optimizer"),
        ("adam", "optimizer"),
        ("clip_by_global", "optimizer"),
        ("postnet", "postnet"),
        # conformer-internal buckets (train-step byte attribution): must
        # precede the encoder/decoder catch-alls — op_name paths look like
        # encoder/layer_3/mhsa/..., decoder/layer_0/ff1/... (nn/conformer.py)
        ("mhsa", "conformer-attn"),
        ("xl_attention", "conformer-attn"),
        ("flash", "conformer-attn"),
        ("/ff1", "conformer-ffn"),
        ("/ff2", "conformer-ffn"),
        ("/conv/", "conformer-conv"),
        ("final_ln", "conformer-norms"),
        ("encoder_", "text-encoder"),
        ("/encoder", "text-encoder"),
        ("decoder", "mel-decoder"),
        ("duration", "variance"),
        ("pitch", "variance"),
        ("energy", "variance"),
        ("variance", "variance"),
        ("gst", "gst"),
        ("style", "gst"),
        ("gaussian", "upsampling"),
        ("length_reg", "upsampling"),
        ("melspectrogram", "mel-loss"),
        ("stft", "mel-loss"),
    ):
        if key in n:
            return bucket
    return "other"


_SKIP_KINDS = {
    "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
    "after-all", "partition-id", "replica-id",
}


def computation_blocks(hlo_text: str):
    """Split HLO text into {computation_name: [instruction lines]}; the
    ENTRY computation is stored under the key "ENTRY". Fused-computation
    bodies stay separate so they never double-count against their fusion
    call (whose line already inlines all operand shapes)."""
    blocks, headers, cur, name = {}, {}, None, None
    for line in hlo_text.splitlines():
        s = line.strip()
        if cur is None:
            m = re.match(r"(ENTRY\s+)?%?([\w.\-]+)\s*\(.*->.*\{", s)
            if m:
                name = "ENTRY" if m.group(1) else m.group(2)
                headers[name] = s
                cur = []
            continue
        if s.startswith("}"):
            blocks[name] = cur
            cur = None
            continue
        cur.append(s)
    blocks["__headers__"] = headers
    return blocks


def local_defs(blocks, name, global_defs):
    """name->shape map for one computation: its header params and its own
    instruction outputs shadow the global map (HLO param/instruction names
    repeat across computations, so a purely global lookup can mis-shape
    fusion-body operands)."""
    defs = dict(global_defs)
    lines = [blocks.get("__headers__", {}).get(name, "")] + blocks.get(name, [])
    for s in lines:
        for pm in re.finditer(r"%?([\w.\-]+):\s+([a-z]+\d*)\[([\d,]*)\]", s):
            defs[pm.group(1)] = (
                pm.group(2), [int(d) for d in pm.group(3).split(",") if d]
            )
        m = re.match(r"(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+([a-z]+\d*)\[([\d,]*)\]", s)
        if m:
            defs[m.group(1)] = (
                m.group(2), [int(d) for d in m.group(3).split(",") if d]
            )
    return defs


def entry_lines(hlo_text: str):
    return computation_blocks(hlo_text).get("ENTRY", [])


def _roofline_rows(lines, blocks=None, defs=None):
    """(rows, per_bucket) roofline estimates for one computation's lines.

    When ``blocks`` is given, fusion calls are followed into their fused
    computation to pick up convolution/dot FLOPs hidden in the body (the
    TPU backend wraps most convs in fusions)."""
    per_bucket = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # flops, bytes, t, n
    rows = []
    for line in lines:
        if not (line.startswith("%") or line.startswith("ROOT ")) or " = " not in line:
            continue
        shapes = parse_shapes(line)
        if not shapes:
            continue
        flops = 0.0
        if " convolution(" in line:
            flops = conv_flops(line, defs)
        elif " dot(" in line:
            flops = dot_flops(line, defs)
        elif " fusion(" in line and blocks is not None:
            cm = re.search(r"calls=%?([\w.\-]+)", line)
            body = blocks.get(cm.group(1), []) if cm else ()
            if any((" convolution(" in bl or " dot(" in bl) for bl in body):
                ldefs = local_defs(blocks, cm.group(1), defs or {})
                for bl in body:
                    if " convolution(" in bl:
                        flops += conv_flops(bl, ldefs)
                    elif " dot(" in bl:
                        flops += dot_flops(bl, ldefs)
        # HBM traffic estimate: every operand read + output written once.
        # Fusions make this an upper bound for elementwise chains, but
        # conv/dot operands genuinely stream from HBM.
        nbytes = float(sum(shape_bytes(d, dims) for d, dims in shapes))
        t = max(flops / PEAK_FLOPS, nbytes / HBM_BW)
        m = _OPNAME_RE.search(line)
        op_name = m.group(1) if m else ""
        rhs = line.split(" = ", 1)[1]
        km = re.search(r"(?:^|\)|\}|\s)([a-z][a-z0-9\-]*)\(", rhs)
        kind = km.group(1) if km else "unknown"
        if kind in _SKIP_KINDS:
            continue
        b = bucket_of(op_name)
        agg = per_bucket[b]
        agg[0] += flops
        agg[1] += nbytes
        agg[2] += t
        agg[3] += 1
        rows.append((t, flops, nbytes, kind, op_name[:110]))
    return rows, per_bucket


def analyze(hlo_text: str, top_n: int = 15):
    blocks = computation_blocks(hlo_text)
    entry = blocks.get("ENTRY", [])
    defs = build_defs(hlo_text)
    rows, per_bucket = _roofline_rows(entry, blocks, defs)

    total_t = sum(v[2] for v in per_bucket.values()) or 1.0
    print(f"{'bucket':<20} {'GFLOP':>10} {'MB':>10} {'t_lb(ms)':>10} {'share':>7} {'ops':>6}")
    for b, (fl, by, t, n) in sorted(per_bucket.items(), key=lambda kv: -kv[1][2]):
        print(f"{b:<20} {fl/1e9:>10.2f} {by/1e6:>10.1f} {t*1e3:>10.3f} "
              f"{t/total_t:>6.1%} {n:>6}")
    print(f"\nroofline total lower bound: {total_t*1e3:.2f} ms "
          f"(pure-compute floor, no scheduling/overheads; while-loop bodies "
          f"counted once, see scan table)")
    print(f"\ntop {top_n} instructions by roofline time:")
    for t, fl, by, kind, name in sorted(rows, reverse=True)[:top_n]:
        print(f"  {t*1e6:>9.1f}us {kind:<18} {fl/1e9:>8.2f}GF {by/1e6:>8.2f}MB  {name}")

    # sequential scans: a lax.scan compiles to a `while` whose per-iteration
    # body runs trip-count times back-to-back — the latency-bound regime
    # that caps the train step (PARITY.md honest notes). Report each body's
    # per-iteration roofline so body_t x trip_count can be compared to the
    # big buckets above.
    whiles = []
    for line in entry:
        if " while(" not in line:
            continue
        bm = re.search(r"body=%?([\w.\-]+)", line)
        om = _OPNAME_RE.search(line)
        if bm:
            whiles.append((bm.group(1), om.group(1) if om else ""))
    if whiles:
        scored = []
        for body, op_name in whiles:
            b_rows, b_buckets = _roofline_rows(blocks.get(body, []), blocks, defs)
            t_iter = sum(v[2] for v in b_buckets.values())
            n_ops = sum(v[3] for v in b_buckets.values())
            scored.append((t_iter, n_ops, body, op_name))
        scored.sort(reverse=True)
        print("\nsequential while/scan bodies (per-iteration lower bound, "
              "top 10 of %d):" % len(scored))
        for t_iter, n_ops, body, op_name in scored[:10]:
            print(f"  {t_iter*1e6:>9.2f}us/iter {n_ops:>4} ops  "
                  f"body={body[:40]:<42} {op_name[:80]}")


def build_and_lower(batch: int = 16, t_text: int = 64, t_mel: int = 512,
                    bf16: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.infer.api import cast_floating
    from viet_tts_tpu.models.jets import JETS
    from viet_tts_tpu.text import NUM_SYMBOLS
    from viet_tts_tpu.train.state import init_on_cpu

    conf = derive_task_config(build_config(os.path.join(REPO, "config")), "jets")
    hp = dict(conf["models"]["jets"]["generator_params"])
    model = JETS(n_symbols=NUM_SYMBOLS, n_channels=80, hparams=hp, n_speakers=2)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    text = jnp.asarray(rng.randint(1, NUM_SYMBOLS, (batch, t_text)).astype(np.int32))
    lens = jnp.asarray(np.full(batch, t_text, np.int32))
    sids = jnp.zeros(batch, jnp.int32)
    variables = init_on_cpu(
        model.init, {"params": key, "dropout": key, "noise": key},
        sids, text, lens, t_mel, method=model.inference,
    )
    if bf16:
        variables = cast_floating(variables, jnp.bfloat16)

    @jax.jit
    def synth(variables, sids, text, lens):
        return model.apply(variables, sids, text, lens, t_mel,
                           method=model.inference)

    lowered = synth.lower(variables, sids, text, lens)
    compiled = lowered.compile()
    return compiled


def build_and_lower_fs2_train(mixed_precision: bool = False,
                              remat: bool = False, batch: int | None = None,
                              attn: str | None = None):
    """Lower the full-config FS2 train step (fwd+bwd+AdamW) via the bench
    harness helpers — same graph `train_fs2_*` numbers come from. With
    ``remat`` the per-block gradient checkpointing path (`train_fs2_remat_*`
    stages) is lowered instead; ``batch``/``attn`` select the byte-regime
    variants (`train_fs2_b64_*`, `train_fs2_flash_*`)."""
    import jax

    import bench
    from viet_tts_tpu.train.steps import make_fs2_train_step

    model, criterion, state, batch_ = bench._fs2_train_setup(
        remat=remat, batch_size=batch, attn=attn)
    step = jax.jit(make_fs2_train_step(model, criterion, mixed_precision))
    key = jax.random.PRNGKey(0)
    return step.lower(state, batch_, key).compile()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", choices=["jets", "fs2_train"], default="jets")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="fs2_train only: lower the per-block remat variant")
    ap.add_argument("--attn", default=None,
                    help="fs2_train only: attn_implementation override")
    ap.add_argument("--train-batch", type=int, default=None,
                    help="fs2_train only: batch-size override (e.g. 64)")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")  # sitecustomize guard
    else:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )

    if args.graph == "fs2_train":
        compiled = build_and_lower_fs2_train(
            mixed_precision=args.bf16, remat=args.remat,
            batch=args.train_batch, attn=args.attn,
        )
    else:
        compiled = build_and_lower(batch=args.batch, bf16=args.bf16)
    hlo = compiled.as_text()
    print(f"# optimized HLO: {len(hlo.splitlines())} lines, "
          f"platform={__import__('jax').devices()[0].platform}\n")
    analyze(hlo, top_n=args.top)


if __name__ == "__main__":
    main()
