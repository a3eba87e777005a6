"""TensorBoard event-file writer: wire-format round-trip without TF."""

import struct

import numpy as np

from fastvim_tpu.utils.tboard import SummaryWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # canonical check value + RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(bytes(range(32))) == 0x46DD794E


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return out
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload)
            out.append(payload)


def _parse_scalars(payload):
    """Minimal proto walk: Event.step (f2 varint) + Summary values."""
    i, step, scalars = 0, None, {}

    def varint(buf, i):
        v = s = 0
        while True:
            b = buf[i]
            i += 1
            v |= (b & 0x7F) << s
            s += 7
            if not b & 0x80:
                return v, i

    def walk_summary(buf):
        i = 0
        while i < len(buf):
            key, i = varint(buf, i)
            ln, i = varint(buf, i)
            val = buf[i:i + ln]
            i += ln
            # Value{ tag=1 str, simple_value=2 float }
            j, tag, sv = 0, None, None
            while j < len(val):
                k, j = varint(val, j)
                if k >> 3 == 1:
                    ln2, j = varint(val, j)
                    tag = val[j:j + ln2].decode()
                    j += ln2
                elif k >> 3 == 2:
                    (sv,) = struct.unpack("<f", val[j:j + 4])
                    j += 4
                else:
                    raise AssertionError(k)
            scalars[tag] = sv

    while i < len(payload):
        key, i = varint(payload, i)
        num, wire = key >> 3, key & 7
        if wire == 0:
            v, i = varint(payload, i)
            if num == 2:
                step = v
        elif wire == 1:
            i += 8
        elif wire == 5:
            i += 4
        elif wire == 2:
            ln, i = varint(payload, i)
            if num == 5:
                walk_summary(payload[i:i + ln])
            i += ln
    return step, scalars


def test_summary_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalars(3, {"train/loss": 0.5, "lr": np.float32(1e-3),
                      "note": "skipped-string"})
    w.add_scalar(4, "val/acc", 0.75)
    w.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 3  # file_version + 2 events
    step, scalars = _parse_scalars(records[1])
    assert step == 3
    assert abs(scalars["train/loss"] - 0.5) < 1e-7
    assert abs(scalars["lr"] - 1e-3) < 1e-9
    assert "note" not in scalars
    step2, scalars2 = _parse_scalars(records[2])
    assert step2 == 4 and abs(scalars2["val/acc"] - 0.75) < 1e-7
