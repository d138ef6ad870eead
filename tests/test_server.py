"""HTTP serving endpoint (`infer/server.py`): health + synthesize round
trip against a live server over a tiny JETS backend, and WAV framing."""

import http.client
import json
import struct

import numpy as np

from viet_tts_tpu.infer.server import serve, wav_bytes


def test_wav_bytes_framing():
    wave = np.sin(np.linspace(0, 20, 1000)).astype(np.float32) * 0.5
    data = wav_bytes(wave, 22050)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    sr = struct.unpack("<I", data[24:28])[0]
    n = struct.unpack("<I", data[40:44])[0]
    assert sr == 22050 and n == 2000  # 16-bit mono
    pcm = np.frombuffer(data[44:], "<i2").astype(np.float32) / 32767.0
    np.testing.assert_allclose(pcm, wave, atol=1e-4)


def test_server_roundtrip(tmp_path):
    from tests.test_export import _tiny_jets_ckpt
    from viet_tts_tpu.infer.api import OneStageTTS

    ckpt_dir = _tiny_jets_ckpt(tmp_path)
    tts = OneStageTTS(ckpt_dir, model_type="JETS", max_mel_frames=64,
                      packed_vocoder=False)
    httpd = serve(tts, port=0, model_name="jets-test")
    port = httpd.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/health")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["model"] == "jets-test"

        payload = json.dumps({"text": "xin chào các bạn", "speaker": "spk"})
        conn.request("POST", "/synthesize", body=payload,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type") == "audio/wav"
        data = r.read()
        assert data[:4] == b"RIFF"
        pcm = np.frombuffer(data[44:], "<i2")
        assert pcm.size > 0 and np.isfinite(pcm).all()

        # chunked streaming endpoint: PCM matches the batch synth closely
        conn.request("POST", "/synthesize_stream", body=payload,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type").startswith("audio/L16")
        stream_pcm = np.frombuffer(r.read(), "<i2")  # http.client de-chunks
        assert stream_pcm.size == pcm.size
        np.testing.assert_allclose(
            stream_pcm.astype(np.int32), pcm.astype(np.int32), atol=16
        )

        # malformed request -> 400, server stays alive
        conn.request("POST", "/synthesize", body="{}",
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.request("GET", "/health")
        assert conn.getresponse().status == 200
    finally:
        httpd.shutdown()
