"""Minimal self-contained xplane.pb reader (protobuf wire format, no deps).

``jax.profiler.trace`` writes XSpace protos (``*.xplane.pb``). The full
parser stack (tensorflow + tensorboard-plugin-profile) is version-fragile,
so this decodes just the fields the op-table tooling needs:

    XSpace.planes[].name / .lines[] / .event_metadata{}
    XLine.name / .events[]
    XEvent.metadata_id / .duration_ps / .num_occurrences
    XEventMetadata.id / .name

Schema: tsl/profiler/protobuf/xplane.proto (public TensorFlow/TSL).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message.

    value: int for varint(0)/fixed(1,5), bytes for length-delimited(2).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:  # groups (3, 4) don't appear in xplane
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


@dataclass
class XEvent:
    metadata_id: int = 0
    duration_ps: int = 0
    num_occurrences: int = 0


@dataclass
class XLine:
    name: str = ""
    events: List[XEvent] = field(default_factory=list)


@dataclass
class XPlane:
    name: str = ""
    lines: List[XLine] = field(default_factory=list)
    event_metadata: Dict[int, str] = field(default_factory=dict)


def _parse_event(buf: bytes) -> XEvent:
    ev = XEvent()
    for fnum, _, val in _iter_fields(buf):
        if fnum == 1:
            ev.metadata_id = val
        elif fnum == 3:
            ev.duration_ps = val
        elif fnum == 5:
            ev.num_occurrences = val
    return ev


def _parse_line(buf: bytes) -> XLine:
    line = XLine()
    for fnum, _, val in _iter_fields(buf):
        if fnum == 2:
            line.name = val.decode("utf-8", "replace")
        elif fnum == 4:
            line.events.append(_parse_event(val))
    return line


def _parse_event_metadata_entry(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry → (id, name)."""
    key = 0
    name = ""
    for fnum, _, val in _iter_fields(buf):
        if fnum == 1:
            key = val
        elif fnum == 2:  # XEventMetadata
            for f2, _, v2 in _iter_fields(val):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf: bytes) -> XPlane:
    plane = XPlane()
    for fnum, _, val in _iter_fields(buf):
        if fnum == 2:
            plane.name = val.decode("utf-8", "replace")
        elif fnum == 3:
            plane.lines.append(_parse_line(val))
        elif fnum == 4:
            k, name = _parse_event_metadata_entry(val)
            plane.event_metadata[k] = name
    return plane


def parse_xspace(path: str) -> List[XPlane]:
    """Parse an .xplane.pb file into a list of XPlane."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fnum, _, val in _iter_fields(buf):
        if fnum == 1:
            planes.append(_parse_plane(val))
    return planes


def device_op_totals(path: str) -> Dict[str, float]:
    """Aggregate device XLA-op self-time (seconds) per op name."""
    totals: Dict[str, float] = {}
    for plane in parse_xspace(path):
        lname = plane.name.lower()
        if "tpu" not in lname and "gpu" not in lname:
            continue
        if "host" in lname:
            continue
        for line in plane.lines:
            if "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                name = plane.event_metadata.get(ev.metadata_id,
                                                str(ev.metadata_id))
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e12
    return totals
