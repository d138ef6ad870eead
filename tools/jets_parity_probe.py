"""Localize the JETS import-parity MCD (VERDICT r3 item 4).

The waveform-path MCD vs the reference under imported weights is ~0.21 dB
(bench stage_mcd_jets) while FS2's is 1e-4 dB. This probe runs BOTH
inferences stage by stage on identical inputs (CPU, fp32 — so any delta is
algorithmic/accumulation order, not MXU rounding) and reports per-stage
deviations to name the stage where the divergence enters or amplifies:

  encoder out -> +GST/sid conditioning -> pitch/energy/duration predictors
  -> upsampled hidden -> decoder out (zs) -> generator waveform.

Torch intermediates come from forward hooks on the reference's own modules
(`/root/reference/models/gan_tts/jets/model.py:645-746`); flax ones from
``capture_intermediates``. Usage:

  JAX_PLATFORMS=cpu python tools/jets_parity_probe.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import copy

import jax.numpy as jnp
import numpy as np
import torch


def rel(name, a, b):
    """Report max|d| and relative RMS between two stage outputs."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        print(f"{name:28s} SHAPE MISMATCH {a.shape} vs {b.shape}")
        return
    denom = float(np.sqrt(np.mean(a * a))) or 1.0
    rrms = float(np.sqrt(np.mean((a - b) ** 2)) / denom)
    print(f"{name:28s} shape={str(a.shape):20s} max|d|={np.abs(a - b).max():.3e} "
          f"rel_rms={rrms:.3e}")
    return rrms


def main():
    from tests.test_torch_import import _load_reference_jets
    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.dsp.stft import log_mel_spectrogram
    from viet_tts_tpu.eval.mcd import mcd
    from viet_tts_tpu.models.jets import JETS
    from viet_tts_tpu.train.torch_import import import_jets

    conf = derive_task_config(build_config(os.path.join(REPO, "config")), "jets")
    hp = copy.deepcopy(conf["models"]["jets"]["generator_params"])
    TorchJETS = _load_reference_jets()
    torch.manual_seed(0)
    tm = TorchJETS(idim=132, odim=80, spks=2, **hp).eval()
    fm = JETS(n_symbols=131, n_channels=80, hparams=dict(hp), n_speakers=2)
    variables = import_jets(tm.state_dict(), hp)

    rng = np.random.RandomState(5)
    Bp, Tt, Tm = 2, 16, 48
    text = rng.randint(1, 131, (Bp, Tt))
    lens = np.asarray([Tt, 12])
    text[1, 12:] = 0
    sids = np.asarray([0, 1])
    feats = rng.randn(Bp, Tm, 80).astype(np.float32)

    # ---- torch side with hooks -------------------------------------------
    cap = {}

    def hook(name):
        def fn(_mod, _inp, out):
            cap[name] = out

        return fn

    for name in ("encoder", "gst", "pitch_predictor", "energy_predictor",
                 "length_regulator", "decoder", "generator"):
        getattr(tm, name).register_forward_hook(hook(name))

    # the reference calls duration_predictor.inference (not forward), so
    # forward hooks never fire there — wrap it instead
    dp_inf = tm.duration_predictor.inference

    def dp_wrapped(*a, **kw):
        out = dp_inf(*a, **kw)
        cap["duration_predictor"] = out
        return out

    tm.duration_predictor.inference = dp_wrapped

    with torch.no_grad():
        t_wav, t_wav_lens = tm.inference(
            torch.from_numpy(text).long(), torch.from_numpy(lens).long(),
            feats=torch.from_numpy(feats), sids=torch.from_numpy(sids).long(),
        )

    # ---- flax side with capture_intermediates ----------------------------
    up = int(np.prod(hp.get("generator_upsample_scales", [8, 8, 2, 2])))
    max_mel = t_wav.shape[-1] // up
    (j_wav, j_wav_lens), state = fm.apply(
        variables, jnp.asarray(sids), jnp.asarray(text), jnp.asarray(lens),
        int(max_mel), feats=jnp.asarray(feats), method=fm.inference,
        capture_intermediates=True, mutable=["intermediates"],
    )
    inter = state["intermediates"]

    def jax_out(path):
        node = inter
        for p in path.split("."):
            node = node[p]
        return node["__call__"][0]

    print(f"torch wav_lens={t_wav_lens.numpy()}, flax wav_lens={np.asarray(j_wav_lens)}")
    print()

    # stage table (torch -> flax). encoder/decoder return (hs, mask) tuples
    # on both sides; generator output layouts differ ((B,1,T) vs (B,T,1)).
    rel("encoder_out", cap["encoder"][0].numpy(), jax_out("encoder")[0])
    rel("gst_style_emb", cap["gst"].numpy(), jax_out("gst"))
    rel("pitch_pred", cap["pitch_predictor"].numpy(), jax_out("pitch_predictor"))
    rel("energy_pred", cap["energy_predictor"].numpy(),
        jax_out("energy_predictor"))
    rel("duration_pred", cap["duration_predictor"].numpy(),
        jax_out("duration_predictor"))
    hs_up_t = cap["length_regulator"].numpy()
    zs_t = cap["decoder"][0].numpy()
    zs_j = jax_out("decoder")[0]
    # upsampled hidden: flax gaussian_upsample is a function (not captured);
    # reconstruct the comparison at the decoder boundary instead
    rel("decoder_out_zs", zs_t, np.asarray(zs_j)[:, : zs_t.shape[1]])
    wav_t = cap["generator"].numpy()[:, 0]  # (B, T)
    wav_j = np.asarray(jax_out("generator"))[..., 0]
    rel("generator_wav", wav_t, wav_j[:, : wav_t.shape[-1]])
    print(f"(upsampled-hidden torch shape for reference: {hs_up_t.shape})")

    # ---- MCD decomposition ----------------------------------------------
    # a) end-to-end waveform MCD (the 0.21 dB headline number)
    # b) MCD of flax wav vs torch wav after substituting the TORCH zs into
    #    the flax generator: isolates acoustic-trunk vs vocoder contribution
    print()
    vals, vals_voc = [], []
    for i in range(Bp):
        n = int(t_wav_lens[i])
        m_t = np.asarray(log_mel_spectrogram(jnp.asarray(t_wav.numpy()[i, :n])))
        m_j = np.asarray(log_mel_spectrogram(jnp.asarray(np.asarray(j_wav)[i, :n])))
        vals.append(mcd(m_j, m_t, 13))
    print(f"mcd end-to-end            = {np.mean(vals):.4f} dB")

    wav_sub = fm.apply(variables, jnp.asarray(zs_t), method=fm.decode_hidden)
    wav_sub = np.asarray(wav_sub)
    for i in range(Bp):
        n = int(t_wav_lens[i])
        m_t = np.asarray(log_mel_spectrogram(jnp.asarray(t_wav.numpy()[i, :n])))
        m_s = np.asarray(log_mel_spectrogram(jnp.asarray(wav_sub[i, :n])))
        vals_voc.append(mcd(m_s, m_t, 13))
    print(f"per-item end-to-end MCD   = {[round(v, 4) for v in vals]}")
    print(f"mcd vocoder-only (torch zs)= {np.mean(vals_voc):.4f} dB")
    print(f"=> acoustic-trunk contribution ~ {np.mean(vals) - np.mean(vals_voc):.4f} dB")

    # ---- hypothesis check: padding contamination --------------------------
    # The reference decoder runs UNMASKED at inference (h_masks=None when
    # feats_lengths is None, jets/model.py:735-740): padded frames beyond an
    # item's duration sum feed self-attention and contaminate valid frames
    # whenever items are batched. Ours masks to predicted mel_lens. At B=1
    # with max_mel == the exact duration sum both graphs see zero padding,
    # so if the 0.21 dB is padding contamination, B=1 MCD should collapse.
    print()
    for i in range(Bp):
        L = int(lens[i])  # trim padding so both sides see the bare item
        ti = torch.from_numpy(text[i : i + 1, :L]).long()
        li = torch.from_numpy(lens[i : i + 1]).long()
        si = torch.from_numpy(sids[i : i + 1]).long()
        fi = torch.from_numpy(feats[i : i + 1])
        with torch.no_grad():
            w_t, wl_t = tm.inference(ti, li, feats=fi, sids=si)
        exact_mel = w_t.shape[-1] // up
        w_j, wl_j = fm.apply(
            variables, jnp.asarray(sids[i : i + 1]),
            jnp.asarray(text[i : i + 1, :L]), jnp.asarray(lens[i : i + 1]),
            int(exact_mel), feats=jnp.asarray(feats[i : i + 1]),
            method=fm.inference,
        )
        n = int(wl_t[0])
        m_t = np.asarray(log_mel_spectrogram(jnp.asarray(w_t.numpy()[0, :n])))
        m_j = np.asarray(log_mel_spectrogram(jnp.asarray(np.asarray(w_j)[0, :n])))
        print(f"B=1 item {i}: exact_mel={exact_mel:4d}  "
              f"mcd={mcd(m_j, m_t, 13):.5f} dB")


if __name__ == "__main__":
    main()
