import numpy as np
import pyarrow as pa
import ray.data


def _pnm(w, h, pixels, magic=b"P5"):
    return b"%s\n%d %d\n255\n" % (magic, w, h) + bytes(pixels)


def test_resize_exec_downsamples_known_pixels(ray_session):
    from rdf_mapper_ray.ops.multimodal import ResizeExec
    # 4x4 grayscale ramp; nearest-neighbor to 2x2 picks rows/cols {0,2}
    px = list(range(16))
    batch = pa.Table.from_pydict({
        "item_id": pa.array([1], pa.int64()),
        "payload": pa.array([_pnm(4, 4, px)], pa.binary()),
    })
    out = ResizeExec(max_side=2)(batch)
    assert out.column("new_width")[0].as_py() == 2
    assert out.column("new_height")[0].as_py() == 2
    p = out.column("payload")[0].as_py()
    assert p.startswith(b"P5\n2 2\n255\n")
    assert list(p[-4:]) == [0, 2, 8, 10]


def test_resize_exec_rgb_and_roundtrip(ray_session):
    from rdf_mapper_ray.ops.multimodal import ResizeExec, _PNMCodec
    rgb = bytes(range(48))          # 4x4 RGB
    batch = pa.Table.from_pydict({
        "item_id": pa.array([7], pa.int64()),
        "payload": pa.array([_pnm(4, 4, rgb, b"P6")], pa.binary()),
    })
    out = ResizeExec(max_side=2)(batch)
    p = out.column("payload")[0].as_py()
    w, h, samples = _PNMCodec().decode(p)
    assert (w, h) == (2, 2) and len(samples) == 12
    # pixel (0,0) keeps channel bytes 0,1,2; pixel (0,1) = source col 2
    assert list(samples[:6]) == [0, 1, 2, 6, 7, 8]


def test_resize_exec_distributed_over_fake_payloads(ray_session):
    from rdf_mapper_ray.ops.multimodal import (ResizeExec,
                                               multimodal_dataset)
    ds = multimodal_dataset("/root/testdata/sf0.001")
    out = ds.map_batches(ResizeExec(max_side=16), batch_size=64,
                         concurrency=2, batch_format="pyarrow") \
        .to_pandas()
    assert len(out) == 500
    assert (out["new_width"] <= 16).all() and (out["new_height"] <= 16).all()
    assert out["payload"].map(lambda b: b.startswith(b"P5")).all()


def _wav_bytes(samples, rate=8000):
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def test_audio_spectral_sine_centroid_and_zcr(ray_session):
    from rdf_mapper_ray.ops.multimodal import AudioSpectral
    rate, f = 8000, 1000.0
    t = np.arange(rate) / rate
    sine = (10000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
    batch = pa.Table.from_pydict({
        "item_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([_wav_bytes(sine),
                             _wav_bytes(np.zeros(4000))], pa.binary()),
    })
    out = AudioSpectral()(batch).to_pandas().set_index("item_id")
    # a pure 1 kHz tone: centroid near 1 kHz, zcr near 2f/rate
    assert abs(out.loc[1, "spec_centroid_hz"] - f) < 100
    assert abs(out.loc[1, "zcr"] - 2 * f / rate) < 0.02
    # the tone's energy concentrates in one band
    be = np.array(out.loc[1, "band_energy"])
    assert be.max() / be.sum() > 0.9
    # silence: all zeros
    assert out.loc[2, "spec_centroid_hz"] == 0.0
    assert out.loc[2, "zcr"] == 0.0
