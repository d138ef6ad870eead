"""Interactive model instantiation + parameter dump + checkpoint smoke test.

Role of the reference's example.py: build a model family from the config,
print its parameter tree/count, and optionally load a checkpoint.

    python example.py --model fastspeech2 [--checkpoint path]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--model",
        default="fastspeech2",
        choices=["fastspeech2", "adaspeech", "matcha", "hifigan", "jets", "vits2", "text2wav"],
    )
    p.add_argument("--config", default="config/")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--n_speakers", type=int, default=2)
    args = p.parse_args()

    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.text import NUM_SYMBOLS
    from viet_tts_tpu.train.state import init_on_cpu
    from viet_tts_tpu.utils.model_utils import get_param_num, show_params

    conf = derive_task_config(build_config(args.config), args.model)
    stats = {
        "pitch": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
        "energy": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
    }
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "dropout": key, "reparam": key, "noise": key}
    import jax.numpy as jnp

    ids = jnp.zeros((1, 16), jnp.int32)
    lens = jnp.full((1,), 16, jnp.int32)
    mel = jnp.zeros((1, 64, conf["audio"]["mel"]["channels"]))
    sids = jnp.zeros(1, jnp.int32)

    if args.model == "hifigan":
        from viet_tts_tpu.models.hifigan import HiFiGANGenerator

        model = HiFiGANGenerator()
        variables = init_on_cpu(model.init, key, mel)
    elif args.model in ("fastspeech2", "adaspeech"):
        if args.model == "adaspeech":
            from viet_tts_tpu.models.adaspeech import AdaSpeech as M
        else:
            from viet_tts_tpu.models.fastspeech2 import FastSpeech2 as M
        model = M(
            n_symbols=NUM_SYMBOLS,
            n_channels=conf["audio"]["mel"]["channels"],
            hparams=conf["models"][args.model],
            stats=stats,
            n_speakers=args.n_speakers,
        )
        variables = init_on_cpu(
            model.init, rngs, sids, ids, lens, 64, feats=mel,
            aids=sids, method=model.inference,
        )
    elif args.model == "matcha":
        from viet_tts_tpu.models.matcha import MatchaTTS

        model = MatchaTTS(
            n_symbols=NUM_SYMBOLS,
            n_channels=conf["audio"]["mel"]["channels"],
            hparams=conf["models"]["matcha"],
            stats=stats,
            n_speakers=args.n_speakers,
        )
        variables = init_on_cpu(
            model.init, rngs, sids, ids, lens, 64, feats=mel,
            aids=sids, method=model.inference,
        )
    elif args.model == "jets":
        from viet_tts_tpu.models.jets import JETS

        model = JETS(
            n_symbols=NUM_SYMBOLS,
            n_channels=conf["audio"]["mel"]["channels"],
            hparams=conf["models"]["jets"]["generator_params"],
            n_speakers=args.n_speakers,
        )
        variables = init_on_cpu(
            model.init, rngs, sids, ids, lens, 64, method=model.inference
        )
    elif args.model == "vits2":
        from viet_tts_tpu.models.vits2 import VITS2

        model = VITS2(
            n_symbols=NUM_SYMBOLS, hparams=conf["models"]["vits2"],
            n_speakers=args.n_speakers,
        )
        variables = init_on_cpu(
            model.init, rngs, sids, ids, lens, 64, method=model.inference
        )
    else:
        from viet_tts_tpu.models.text2wav import Text2Wav

        model = Text2Wav(
            n_symbols=NUM_SYMBOLS,
            n_channels=conf["audio"]["mel"]["channels"],
            conf=conf,
            stats=stats,
            n_speakers=args.n_speakers,
            n_accents=2,
            version="fastspeech2",
        )
        variables = init_on_cpu(
            model.init, rngs, sids, ids, lens, 64, method=model.inference
        )

    show_params(variables["params"])
    print(f"\n[{args.model}] total parameters: {get_param_num(variables['params']):,}")

    if args.checkpoint:
        from viet_tts_tpu.infer.api import load_params
        from viet_tts_tpu.train.checkpoint import apply_weights

        payload = load_params(args.checkpoint)
        _, skipped = apply_weights(
            jax.device_get(variables["params"]), payload.get("params", {})
        )
        print(f"checkpoint loaded; {len(skipped)} tensors skipped")
        if skipped[:5]:
            print("skipped (first 5):", skipped[:5])


if __name__ == "__main__":
    main()
