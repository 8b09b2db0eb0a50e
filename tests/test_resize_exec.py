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
