"""SEI message syntax (spec 7.3.2.3 / D.1; J14).

The reference twins are ``FR/src/sei.c`` (1644 LoC) and
``JM/lencod/src/sei.c`` (3065 LoC).  Implemented messages: recovery_point
(D.1.8 — the random-access aid that pairs with intra refresh, F21) and
user_data_unregistered (D.1.7).  The byte-oriented ff-escape coding of
payloadType/payloadSize and payload-bit alignment follow the spec exactly,
so JM's decoder parses (and skips) our SEI NALUs cleanly.
"""

from __future__ import annotations

import uuid

from ..entropy.bitio import BitWriter, BitReader
from ..bitstream.nal import NALU, NAL_SEI

RECOVERY_POINT = 6
USER_DATA_UNREGISTERED = 5


def _payload_header(out: bytearray, ptype: int, size: int):
    while ptype >= 255:
        out.append(255)
        ptype -= 255
    out.append(ptype)
    while size >= 255:
        out.append(255)
        size -= 255
    out.append(size)


def recovery_point_payload(recovery_frame_cnt: int, exact_match: bool = True,
                           broken_link: bool = False,
                           changing_slice_group_idc: int = 0) -> bytes:
    w = BitWriter()
    w.ue(recovery_frame_cnt)
    w.u(int(exact_match), 1)
    w.u(int(broken_link), 1)
    w.u(changing_slice_group_idc, 2)
    w.u(1, 1)                       # payload_bit_equal_to_one + zero pad
    return w.to_bytes()


def user_data_payload(data: bytes, guid: bytes = None) -> bytes:
    guid = guid or uuid.UUID("68323634-7470-7521-b055-4549757564ef").bytes
    assert len(guid) == 16
    return guid + data


def sei_rbsp(messages) -> bytes:
    """messages: list of (payload_type, payload_bytes) -> sei_rbsp bytes."""
    out = bytearray()
    for ptype, payload in messages:
        _payload_header(out, ptype, len(payload))
        out += payload
    out.append(0x80)                # rbsp_trailing_bits
    return bytes(out)


def sei_nalu(messages) -> NALU:
    return NALU(NAL_SEI, 0, sei_rbsp(messages))


def parse_sei_rbsp(rbsp: bytes):
    """-> list of (payload_type, payload_bytes)."""
    out = []
    i = 0
    # rbsp_trailing_bits is only the FINAL 0x80 byte; a 0x80 mid-stream is a
    # valid payloadType byte (e.g. payload type 128), so stop only at the end.
    while i < len(rbsp) and not (i == len(rbsp) - 1 and rbsp[i] == 0x80):
        ptype = 0
        while rbsp[i] == 255:
            ptype += 255
            i += 1
        ptype += rbsp[i]
        i += 1
        size = 0
        while rbsp[i] == 255:
            size += 255
            i += 1
        size += rbsp[i]
        i += 1
        out.append((ptype, rbsp[i:i + size]))
        i += size
    return out


def parse_recovery_point(payload: bytes) -> dict:
    r = BitReader(payload)
    return dict(recovery_frame_cnt=r.ue(), exact_match=bool(r.u(1)),
                broken_link=bool(r.u(1)),
                changing_slice_group_idc=r.u(2))
