"""TensorBoard event writer: record framing, CRCs, proto payloads."""

import struct

from se_unet_airseg_tpu.train.tensorboard import SummaryWriter, _masked_crc


def _read_records(path):
    data = open(path, "rb").read()
    off = 0
    out = []
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == _masked_crc(data[off : off + 8])
        payload = data[off + 12 : off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert crc == _masked_crc(payload)
        out.append(payload)
        off += 12 + length + 4
    return out


def test_records_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalars("Train", {"loss": 1.25, "dice": 0.5}, step=3)
    w.add_scalar("Train/loss", 0.75, step=4)
    w.close()
    recs = _read_records(w._path)
    assert len(recs) == 3  # version + 2 events
    assert b"brain.Event:2" in recs[0]
    assert b"Train/loss" in recs[1]
    # simple_value 1.25 little-endian float appears in the payload
    assert struct.pack("<f", 1.25) in recs[1]
    # jsonl mirror
    lines = open(str(tmp_path / "scalars.jsonl")).read().splitlines()
    assert len(lines) == 2 and '"Train/loss": 1.25' in lines[0]
