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


# ---------------------------------------------------------------------------
# HRD: buffering_period (D.1.2) + pic_timing (D.1.3)
# JM twin: JM/lencod/src/sei.c UpdateBufferingPeriod/UpdatePicTiming shapes
# ---------------------------------------------------------------------------

BUFFERING_PERIOD = 0
PIC_TIMING = 1


def buffering_period_payload(sps_id: int, initial_cpb_removal_delay: int,
                             initial_cpb_removal_delay_offset: int,
                             delay_bits: int = 24,
                             nal_hrd: bool = True) -> bytes:
    """buffering_period SEI (spec D.1.2): one CPB per HRD (SchedSelIdx 0).
    ``delay_bits`` = initial_cpb_removal_delay_length (VUI HRD field)."""
    w = BitWriter()
    w.ue(sps_id)
    if nal_hrd:
        w.u(initial_cpb_removal_delay, delay_bits)
        w.u(initial_cpb_removal_delay_offset, delay_bits)
    w.u(1, 1)                       # payload trailing one + alignment
    return w.to_bytes()


def parse_buffering_period(payload: bytes, delay_bits: int = 24,
                           nal_hrd: bool = True) -> dict:
    r = BitReader(payload)
    out = dict(sps_id=r.ue())
    if nal_hrd:
        out["initial_cpb_removal_delay"] = r.u(delay_bits)
        out["initial_cpb_removal_delay_offset"] = r.u(delay_bits)
    return out


def pic_timing_payload(cpb_removal_delay: int, dpb_output_delay: int,
                       cpb_removal_delay_bits: int = 24,
                       dpb_output_delay_bits: int = 24,
                       pic_struct: int = None) -> bytes:
    """pic_timing SEI (spec D.1.3) with CpbDpbDelaysPresentFlag = 1.
    ``pic_struct`` emitted only when VUI pic_struct_present_flag is set
    (None = absent; 0 = frame)."""
    w = BitWriter()
    w.u(cpb_removal_delay, cpb_removal_delay_bits)
    w.u(dpb_output_delay, dpb_output_delay_bits)
    if pic_struct is not None:
        w.u(pic_struct, 4)          # frame: no clock timestamps follow
        w.u(0, 1)                   # clock_timestamp_flag (NumClockTS=1)
    w.u(1, 1)
    return w.to_bytes()


def parse_pic_timing(payload: bytes, cpb_removal_delay_bits: int = 24,
                     dpb_output_delay_bits: int = 24,
                     pic_struct_present: bool = False) -> dict:
    r = BitReader(payload)
    out = dict(cpb_removal_delay=r.u(cpb_removal_delay_bits),
               dpb_output_delay=r.u(dpb_output_delay_bits))
    if pic_struct_present:
        out["pic_struct"] = r.u(4)
    return out


def hrd_sei_for_sequence(n_frames: int, bitrate_bps: float, cpb_bits: float,
                         fps: float, frame_bits):
    """Per-picture HRD SEI messages for a coded sequence: one
    buffering_period at the IDR + a pic_timing per picture, with delays
    from the leaky-bucket CPB model (90 kHz clock).  ``frame_bits``:
    per-frame coded sizes in bits.  Returns [(ptype, payload), ...] per
    frame (list of per-frame message lists)."""
    t90 = 90000.0
    init_delay = int(t90 * cpb_bits / max(bitrate_bps, 1.0))
    out = []
    for i in range(n_frames):
        msgs = []
        if i == 0:
            msgs.append((BUFFERING_PERIOD,
                         buffering_period_payload(0, init_delay, 0)))
        # tc = 90000 / fps ticks per frame; removal at one frame cadence
        msgs.append((PIC_TIMING,
                     pic_timing_payload(int(i * t90 / fps) if i else 0,
                                        int(t90 / fps))))
        out.append(msgs)
    return out
