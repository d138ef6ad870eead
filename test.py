"""Batch inference CLI — role of the reference's test.py.

The reference fetched news text from two internal HTTP services
(`test.py:52,56`); this environment has no egress, so texts come from
--text/--text_file. Synthesis loops per speaker/accent like the reference
and exports waveforms via save_to_local.

    python test.py --model_type JOINT -c ckpt_dir -o out_dir --text "xin chào"
    python test.py --model_type FASTSPEECH2 -a acoustic_dir -v vocoder_dir \
        --text_file texts.txt -o out_dir
"""

from __future__ import annotations

import argparse
import os
import time

TWO_STAGE = {"FASTSPEECH2", "ADASPEECH", "MATCHA"}
ONE_STAGE = {"JOINT", "JETS", "VITS2"}


def build_arguments():
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="JOINT",
                   choices=sorted(TWO_STAGE | ONE_STAGE))
    p.add_argument("-c", "--checkpoint", type=str, default=None,
                   help="one-stage checkpoint (file or dir)")
    p.add_argument("-a", "--acoustic_checkpoint", type=str, default=None)
    p.add_argument("-v", "--vocoder_checkpoint", type=str, default=None)
    p.add_argument("-o", "--output_folder", type=str, required=True)
    p.add_argument("--text", action="append", default=None,
                   help="sentence to synthesize (repeatable)")
    p.add_argument("--text_file", type=str, default=None,
                   help="file with one sentence per line")
    p.add_argument("--speaker", type=str, default="0")
    p.add_argument("--accent", type=str, default="0")
    p.add_argument("--half", action="store_true",
                   help="serve in bfloat16 (MXU-rate matmuls)")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="time-shard the vocoder over the device mesh "
                        "(single-utterance latency lever)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all visible devices")
    p.add_argument("--pipeline_parallel", action="store_true",
                   help="two-stage only: acoustic stage on device 0, "
                        "vocoder on device 1 (overlaps successive batches)")
    p.add_argument("--stream", action="store_true",
                   help="chunked streaming decode per utterance (first "
                        "audio after one vocoder chunk; two-stage or "
                        "JETS/VITS2)")
    p.add_argument("--d_control", type=float, default=1.0)
    p.add_argument("--p_control", type=float, default=1.0)
    p.add_argument("--e_control", type=float, default=1.0)
    return p.parse_args()


def main():
    args = build_arguments()
    texts = list(args.text or [])
    if args.text_file:
        with open(args.text_file, "r", encoding="utf8") as f:
            texts.extend(line.strip() for line in f if line.strip())
    if not texts:
        raise SystemExit("no input: pass --text or --text_file")

    from viet_tts_tpu.infer.api import OneStageTTS, TwoStageTTS, save_to_local

    speaker = int(args.speaker) if args.speaker.isdigit() else args.speaker
    accent = int(args.accent) if args.accent.isdigit() else args.accent

    t0 = time.time()
    if args.model_type in TWO_STAGE:
        assert args.acoustic_checkpoint and args.vocoder_checkpoint, (
            "two-stage synthesis needs -a and -v checkpoints"
        )
        nnet = TwoStageTTS(
            args.acoustic_checkpoint,
            args.vocoder_checkpoint,
            model_type=args.model_type,
            half=args.half,
            data_parallel=args.data_parallel,
            sequence_parallel=args.sequence_parallel,
            pipeline_parallel=args.pipeline_parallel,
        )
        waves = nnet(
            texts,
            speaker=speaker,
            accent=accent,
            d_control=args.d_control,
            p_control=args.p_control,
            e_control=args.e_control,
        )
    else:
        assert args.checkpoint, "one-stage synthesis needs -c checkpoint"
        if args.pipeline_parallel:
            raise SystemExit(
                "--pipeline_parallel needs a stage boundary; one-stage "
                "models are a single fused graph (use --sequence_parallel "
                "or --data_parallel instead)"
            )
        nnet = OneStageTTS(
            args.checkpoint,
            model_type=args.model_type,
            half=args.half,
            data_parallel=args.data_parallel,
            sequence_parallel=args.sequence_parallel,
        )
        waves = nnet(texts, speaker=speaker)
    load_and_synth = time.time() - t0

    if args.stream:
        import numpy as np

        # chunked decode: report time-to-first-audio per utterance
        kw = {"speaker": speaker}
        if args.model_type in TWO_STAGE:
            kw["accent"] = accent
        waves = []
        for i, text in enumerate(texts):
            t0 = time.time()
            chunks = []
            for chunk in nnet.stream_wav(text, **kw):
                if not chunks:
                    print(f"[{i}] first audio after {time.time() - t0:.3f}s")
                chunks.append(chunk)
            waves.append(np.concatenate(chunks))

    total_audio = 0.0
    for i, w in enumerate(waves):
        path = save_to_local(
            w, os.path.join(args.output_folder, f"utt{i:04d}.wav"), nnet.sr
        )
        total_audio += len(w) / nnet.sr
        print(f"[{i}] {len(w) / nnet.sr:.2f}s -> {path}")

    # steady-state timing (excludes model load + compile)
    t0 = time.time()
    if args.model_type in TWO_STAGE:
        nnet(texts, speaker=speaker, accent=accent)
    else:
        nnet(texts, speaker=speaker)
    steady = time.time() - t0
    rtf = steady / max(total_audio, 1e-9)
    print(
        f"synthesized {len(waves)} utts, {total_audio:.2f}s audio | "
        f"first call {load_and_synth:.2f}s | steady {steady:.3f}s | RTF {rtf:.5f}"
    )


if __name__ == "__main__":
    main()
