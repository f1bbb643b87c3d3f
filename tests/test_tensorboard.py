"""TensorBoard exporter (utils/tensorboard.py): the hand-rolled TFRecord/
Event encoding round-trips through the validating reader, CRCs match the
known-good reference values of the format, and MetricsLogger JSONL files
convert field-for-field."""

import json
import struct

from ip_mcmc_tpu.utils import tensorboard as tb
from ip_mcmc_tpu.utils.logging import MetricsLogger


def test_crc32c_known_vectors():
    # canonical CRC32C test vectors (RFC 3720 appendix B.4)
    assert tb._crc32c(b"123456789") == 0xE3069283
    assert tb._crc32c(b"") == 0
    assert tb._crc32c(b"\x00" * 32) == 0x8A9136AA


def test_varint_roundtrip():
    for n in [0, 1, 127, 128, 300, 2**32, 2**63]:
        got, pos = tb._read_varint(tb._varint(n), 0)
        assert got == n and pos == len(tb._varint(n))


def test_writer_reader_roundtrip(tmp_path):
    with tb.TensorBoardWriter(str(tmp_path)) as w:
        w.scalar("accept_rate", 0.234, step=0)
        w.scalar("accept_rate", 0.240, step=1)
        w.scalars({"ess": 512.0, "rhat": 1.01}, step=1, wall_time=123.5)
        path = w.path
    events = tb.read_events(path)
    # record 0 is the brain.Event:2 version stamp
    assert events[0][2] == {}
    assert events[1][1] == 0
    assert abs(events[1][2]["accept_rate"] - 0.234) < 1e-6
    assert events[2][1] == 1
    assert abs(events[2][2]["accept_rate"] - 0.240) < 1e-6
    wall, step, scalars = events[3]
    assert (wall, step) == (123.5, 1)
    assert scalars["ess"] == 512.0
    assert abs(scalars["rhat"] - 1.01) < 1e-6


def test_reader_rejects_corruption(tmp_path):
    with tb.TensorBoardWriter(str(tmp_path)) as w:
        w.scalar("x", 1.0, step=0)
        path = w.path
    raw = bytearray(open(path, "rb").read())
    raw[-6] ^= 0xFF  # flip a payload byte of the last record
    open(path, "wb").write(bytes(raw))
    try:
        tb.read_events(path)
        assert False, "corrupt payload crc not detected"
    except ValueError as e:
        assert "crc" in str(e)


def test_event_proto_shape():
    """The encoded Event parses as: field 1 fixed64 (wall_time), field 2
    varint (step), field 5 length-delimited (summary) — the exact subset
    TensorBoard's reader consumes."""
    payload = tb._event(7.5, step=3, scalars={"a": 2.0})
    fields = [(f, w) for f, w, _ in tb._fields(payload)]
    assert fields == [(1, 1), (2, 0), (5, 2)]
    wall, step, scalars = tb._parse_event(payload)
    assert (wall, step) == (7.5, 3)
    assert scalars == {"a": 2.0}
    # negative simple_value survives the float32 encoding
    _, _, s2 = tb._parse_event(tb._event(0.0, step=0, scalars={"b": -1.5}))
    assert s2 == {"b": -1.5}


def test_export_jsonl_from_metrics_logger(tmp_path):
    jsonl = tmp_path / "run.jsonl"
    logger = MetricsLogger(path=str(jsonl))
    logger.log({"event": "chunk", "step": 100, "accept_rate": 0.3,
                "min_ess": 40.5, "converged": True})
    logger.log({"event": "chunk", "step": 200, "accept_rate": 0.31,
                "min_ess": 81.0})
    logger.log({"event": "run_complete", "note": "no numerics here"})
    logger.close()

    path = tb.export_jsonl(str(jsonl), str(tmp_path / "tb"))
    events = tb.read_events(path)
    scalar_events = [e for e in events if e[2]]
    assert len(scalar_events) == 2  # the non-numeric record emits nothing
    assert scalar_events[0][1] == 100
    assert abs(scalar_events[0][2]["accept_rate"] - 0.3) < 1e-6
    assert scalar_events[0][2]["min_ess"] == 40.5
    assert "converged" not in scalar_events[0][2]  # bools excluded
    assert scalar_events[1][1] == 200
    # wall_time comes from MetricsLogger's relative-t field
    assert scalar_events[0][0] >= 0.0


def test_record_framing_is_tfrecord(tmp_path):
    """Byte-level framing check against the TFRecord spec: len(uint64 LE) +
    masked_crc(len) + payload + masked_crc(payload)."""
    with tb.TensorBoardWriter(str(tmp_path)) as w:
        path = w.path
    raw = open(path, "rb").read()
    (length,) = struct.unpack("<Q", raw[:8])
    (hcrc,) = struct.unpack("<I", raw[8:12])
    assert hcrc == tb._masked_crc(raw[:8])
    payload = raw[12:12 + length]
    (pcrc,) = struct.unpack("<I", raw[12 + length:16 + length])
    assert pcrc == tb._masked_crc(payload)
    assert b"brain.Event:2" in payload
