"""H.264/AVC Annex-B stream parsing — the video-side metadata layer
behind the multimodal seam (round-10 third pass).

A full H.264 decoder (CABAC/CAVLC entropy decode, intra prediction,
deblocking) is far outside deterministic-oracle territory and stays
the documented NotImplementedError seam in operators/multimodal.py.
But a 100 TB video corpus pipeline rarely needs decoded pixels at
ingest: it needs STREAM METADATA — resolution, frame counts, IDR
(random-access point) density for frame sampling, slice-type mix —
and all of that lives in headers that parse exactly from the public
spec (ITU-T H.264 / ISO 14496-10):

- **Annex-B framing** (:func:`parse_annexb`): start-code scan
  (00 00 01 with optional extra zero bytes), NAL header split
  (forbidden bit, nal_ref_idc, nal_unit_type), and the emulation-
  prevention unescape (00 00 03 0x → drop the 03) that turns EBSP
  back into RBSP — forgetting it corrupts every length and every
  field after the first escaped zero run, so the fixture forces
  escapes and the oracle checks RBSP byte totals.
- **Exp-Golomb** (:func:`_read_ue`/:func:`_read_se`): the ue(v)/
  se(v) codes every H.264 header field uses.
- **SPS parse** (:func:`parse_sps`): profile/level, frame-num width,
  mb-grid dimensions, frame-cropping rectangle → the true pixel
  width/height ((7-4.2.1); 4:2:0 crop units). High-profile SPS
  extensions (chroma_format_idc trees) raise NotImplementedError.
- **MP4 framing** (:func:`parse_avcc_config` /
  :func:`parse_length_prefixed`): the avcC decoder-configuration
  record (ISO 14496-15) with its embedded SPS — track resolution
  from container metadata alone — and the length-prefixed sample
  framing it declares, yielding the same NAL triples as Annex-B.
- **Slice-header prefix parse** (:func:`parse_slice_header`):
  first_mb_in_slice, slice_type (I/P/B mapping mod 5), the
  SPS-width frame_num — enough to classify frames and find random-
  access points without touching entropy-coded slice data.

The writer side (:func:`build_annexb_stream`) emits spec-shaped SPS/
PPS/slice NALs with REAL emulation-prevention insertion, so the
parser is tested against the same escaping rules it undoes.

Scale contract: identical to the codec family — Arrow-batched
``mapInPandas``, payload bytes touched once, zero payload shuffles,
narrow integer stats out (q152).

Reference anchor: none in the reference (it stores no media) — this
is the LLM-training-data surface (SURVEY §6) where video corpora are
overwhelmingly H.264 in MP4/MKV containers.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..registry import register

#: nal_unit_type values this module understands (spec table 7-1)
NAL_SLICE = 1
NAL_IDR = 5
NAL_SPS = 7
NAL_PPS = 8

#: slice_type mod 5 → frame class (spec table 7-6; 5-9 are the
#: "all slices in this picture share the type" variants)
SLICE_CLASS = {0: "P", 1: "B", 2: "I", 3: "SP", 4: "SI"}


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte, bit = divmod(self.pos, 8)
            if byte >= len(self.data):
                raise ValueError("truncated H.264 RBSP")
            v = (v << 1) | ((self.data[byte] >> (7 - bit)) & 1)
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_ue(self, k: int) -> None:
        # exp-Golomb: leadingZeros = len(bin(k+1)) - 1, then k+1
        n = (k + 1).bit_length()
        self.put(0, n - 1)
        self.put(k + 1, n)

    def put_se(self, k: int) -> None:
        self.put_ue(2 * k - 1 if k > 0 else -2 * k)

    def rbsp(self) -> bytes:
        """Append the rbsp_stop_one_bit and zero-pad to a byte."""
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _read_ue(br: _BitReader) -> int:
    zeros = 0
    while br.read(1) == 0:
        zeros += 1
        if zeros > 31:
            raise ValueError("invalid exp-Golomb code")
    return (1 << zeros) - 1 + (br.read(zeros) if zeros else 0)


def _read_se(br: _BitReader) -> int:
    u = _read_ue(br)
    return (u + 1) // 2 if u % 2 else -(u // 2)


def ebsp_escape(rbsp: bytes) -> bytes:
    """RBSP → EBSP: insert emulation_prevention_three_byte (0x03)
    whenever two zero bytes would be followed by 0x00-0x03 (spec
    7.4.1.1) — this is what keeps start codes unique in the stream."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def ebsp_unescape(ebsp: bytes) -> bytes:
    """EBSP → RBSP: drop each 0x03 that follows two zero bytes and
    precedes 0x00-0x03; a 00 00 03 followed by anything else is a
    malformed escape (ValueError)."""
    out = bytearray()
    zeros = 0
    i, n = 0, len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 0x03:
            if i + 1 < n and ebsp[i + 1] > 0x03:
                raise ValueError("malformed emulation-prevention escape")
            zeros = 0
            i += 1
            continue
        if zeros >= 2 and b <= 0x02:
            # 00 00 00 / 00 00 01 / 00 00 02 inside a NAL body: all
            # three are patterns valid EBSP cannot contain (spec
            # 7.4.1.1 requires 00 00 03 before every 00/01/02/03 that
            # would complete a zero pair) — the escape the encoder was
            # REQUIRED to insert is missing (ADVICE r11 closed the
            # 00 00 00 leniency: zero runs now fail as loudly as
            # start-code prefixes)
            raise ValueError(
                "unescaped 00 00 0x sequence inside NAL body"
                if b == 0x00
                else "unescaped start-code prefix inside NAL body"
            )
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def parse_annexb(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Split an Annex-B byte stream into NAL units: returns
    [(nal_unit_type, nal_ref_idc, rbsp_bytes)] with emulation
    prevention already undone. Streams not starting with a start
    code raise NotImplementedError (not Annex-B — e.g. length-
    prefixed MP4 avcC); corrupt NAL headers raise ValueError."""
    n = len(payload)
    starts: list[int] = []
    i = 0
    while i + 2 < n:
        if payload[i] == 0 and payload[i + 1] == 0 and payload[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts or not payload[: starts[0] - 3].strip(b"\x00") == b"":
        raise NotImplementedError(
            "not an Annex-B H.264 stream (no leading start code) — "
            "length-prefixed MP4 samples go through parse_length_prefixed "
            "with the nal_length_size their avcC record declares"
        )
    nals: list[tuple[int, int, bytes]] = []
    for k, at in enumerate(starts):
        end = starts[k + 1] - 3 if k + 1 < len(starts) else n
        body = payload[at:end].rstrip(b"\x00") if k + 1 < len(starts) else payload[at:end]
        if not body:
            raise ValueError("empty NAL unit")
        hdr = body[0]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set in NAL header")
        nals.append(((hdr & 0x1F), (hdr >> 5) & 0x03, ebsp_unescape(body[1:])))
    return nals


def parse_avcc_config(avcc: bytes) -> dict:
    """Parse an AVCDecoderConfigurationRecord (ISO 14496-15 §5.2.4.1
    — the ``avcC`` box payload every MP4/MKV H.264 track carries):
    configuration version, profile/level, the NAL length-field size
    used by the track's length-prefixed samples, and the embedded
    SPS/PPS NAL units (SPS parsed through :func:`parse_sps`, so the
    track resolution comes straight out of container metadata without
    touching a single sample)."""
    if len(avcc) < 7:
        raise ValueError("truncated avcC record")
    if avcc[0] != 1:
        raise ValueError(f"avcC configurationVersion {avcc[0]} != 1")
    profile, compat, level = avcc[1], avcc[2], avcc[3]
    nal_length_size = (avcc[4] & 0x03) + 1
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        if pos + 2 > len(avcc):
            raise ValueError("truncated avcC SPS table")
        (ln,) = struct.unpack_from(">H", avcc, pos)
        pos += 2
        nal = avcc[pos : pos + ln]
        if len(nal) != ln or not nal:
            raise ValueError("truncated avcC SPS NAL")
        if nal[0] & 0x1F != NAL_SPS:
            raise ValueError("avcC SPS table entry is not an SPS NAL")
        sps_list.append(parse_sps(ebsp_unescape(nal[1:])))
        pos += ln
    if pos >= len(avcc):
        raise ValueError("truncated avcC PPS table")
    n_pps = avcc[pos]
    pos += 1
    pps_count = 0
    for _ in range(n_pps):
        if pos + 2 > len(avcc):
            raise ValueError("truncated avcC PPS table")
        (ln,) = struct.unpack_from(">H", avcc, pos)
        pos += 2 + ln
        if pos > len(avcc):
            raise ValueError("truncated avcC PPS NAL")
        pps_count += 1
    if not sps_list:
        raise ValueError("avcC without an SPS")
    return {
        "profile_idc": profile,
        "compat": compat,
        "level_idc": level,
        "nal_length_size": nal_length_size,
        "sps": sps_list,
        "n_pps": pps_count,
        "width": sps_list[0]["width"],
        "height": sps_list[0]["height"],
    }


def parse_length_prefixed(payload: bytes, nal_length_size: int = 4) -> list[
    tuple[int, int, bytes]
]:
    """Split MP4-style length-prefixed H.264 sample data (the framing
    ``avcC.nal_length_size`` declares) into NAL units — the same
    (nal_unit_type, nal_ref_idc, rbsp) triples :func:`parse_annexb`
    yields, so everything downstream (SPS/slice-header parse,
    :func:`stream_index`) works on either wire format."""
    if nal_length_size not in (1, 2, 4):
        raise ValueError(f"illegal NAL length-field size {nal_length_size}")
    nals: list[tuple[int, int, bytes]] = []
    pos, n = 0, len(payload)
    while pos < n:
        if pos + nal_length_size > n:
            raise ValueError("truncated NAL length prefix")
        ln = int.from_bytes(payload[pos : pos + nal_length_size], "big")
        pos += nal_length_size
        body = payload[pos : pos + ln]
        if len(body) != ln or not body:
            raise ValueError("truncated length-prefixed NAL")
        hdr = body[0]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set in NAL header")
        nals.append(((hdr & 0x1F), (hdr >> 5) & 0x03, ebsp_unescape(body[1:])))
        pos += ln
    return nals


def parse_sps(rbsp: bytes) -> dict:
    """Parse a baseline/main SPS RBSP → dict with profile_idc,
    level_idc, log2_max_frame_num, and the cropped pixel width/
    height (4:2:0 frame-mbs-only crop units). High-profile SPS
    (chroma_format_idc present) and pic_order_cnt_type 1 raise
    NotImplementedError."""
    br = _BitReader(rbsp)
    profile_idc = br.read(8)
    br.read(8)  # constraint flags + reserved
    level_idc = br.read(8)
    sps_id = _read_ue(br)
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        raise NotImplementedError(
            "high-profile SPS (chroma_format_idc tree) — baseline/main SPS parse only"
        )
    log2_max_frame_num = _read_ue(br) + 4
    poc_type = _read_ue(br)
    if poc_type == 0:
        _read_ue(br)  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        raise NotImplementedError("pic_order_cnt_type 1 SPS")
    _read_ue(br)  # max_num_ref_frames
    br.read(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = _read_ue(br) + 1
    h_units = _read_ue(br) + 1
    frame_mbs_only = br.read(1)
    if not frame_mbs_only:
        br.read(1)  # mb_adaptive_frame_field_flag
    br.read(1)  # direct_8x8_inference_flag
    crop = [0, 0, 0, 0]
    if br.read(1):  # frame_cropping_flag
        crop = [_read_ue(br) for _ in range(4)]  # left, right, top, bottom
    # 4:2:0 crop units: X=2, Y=2*(2 - frame_mbs_only)  (spec 7-21/7-22)
    width = w_mbs * 16 - 2 * (crop[0] + crop[1])
    height = (2 - frame_mbs_only) * h_units * 16 - 2 * (2 - frame_mbs_only) * (
        crop[2] + crop[3]
    )
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num,
        "width": width,
        "height": height,
    }


def parse_slice_header(rbsp: bytes, log2_max_frame_num: int) -> dict:
    """Parse the slice-header prefix every slice shares:
    first_mb_in_slice, slice_type (+ its I/P/B class), pps id, and
    the SPS-width frame_num. Stops before the ref-pic machinery —
    everything a frame-sampling index needs is in the prefix."""
    br = _BitReader(rbsp)
    first_mb = _read_ue(br)
    slice_type = _read_ue(br)
    if slice_type > 9:
        raise ValueError(f"invalid slice_type {slice_type}")
    pps_id = _read_ue(br)
    frame_num = br.read(log2_max_frame_num)
    return {
        "first_mb_in_slice": first_mb,
        "slice_type": slice_type,
        "slice_class": SLICE_CLASS[slice_type % 5],
        "pps_id": pps_id,
        "frame_num": frame_num,
    }


def stream_index(payload: bytes) -> dict:
    """One pass over an Annex-B stream → the ingest-time index a
    frame-sampling pipeline needs: resolution from the SPS, NAL
    count, IDR/I/P/B slice counts, frame_num sum (an order
    checksum), and total RBSP slice bytes (wrong if emulation
    prevention was mishandled)."""
    sps = None
    out = {
        "n_nals": 0, "n_idr": 0, "n_i": 0, "n_p": 0, "n_b": 0,
        "sum_frame_num": 0, "slice_rbsp_bytes": 0,
    }
    for ntype, _ref, rbsp in parse_annexb(payload):
        out["n_nals"] += 1
        if ntype == NAL_SPS:
            sps = parse_sps(rbsp)
        elif ntype in (NAL_SLICE, NAL_IDR):
            if sps is None:
                raise ValueError("slice NAL before any SPS")
            sh = parse_slice_header(rbsp, sps["log2_max_frame_num"])
            out["n_idr"] += ntype == NAL_IDR
            cls = sh["slice_class"]
            if cls == "I":
                out["n_i"] += 1
            elif cls == "P":
                out["n_p"] += 1
            elif cls == "B":
                out["n_b"] += 1
            out["sum_frame_num"] += sh["frame_num"]
            out["slice_rbsp_bytes"] += len(rbsp)
    if sps is None:
        raise ValueError("Annex-B stream without an SPS")
    out["width"] = sps["width"]
    out["height"] = sps["height"]
    return out


# ---------------------------------------------------------------------------
# Writer side: spec-shaped NAL construction for the q152 fixture
# ---------------------------------------------------------------------------


def _nal(ref_idc: int, ntype: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | ntype]) + ebsp_escape(rbsp)


def build_sps(w_mbs: int, h_mbs: int, crop_right: int, crop_bottom: int) -> bytes:
    """Baseline-profile SPS RBSP: 16·mbs grid minus a 4:2:0 crop."""
    w = _BitWriter()
    w.put(66, 8)  # profile_idc: baseline
    w.put(0, 8)  # constraint flags
    w.put(30, 8)  # level 3.0
    w.put_ue(0)  # sps id
    w.put_ue(0)  # log2_max_frame_num_minus4 → 4-bit frame_num
    w.put_ue(2)  # pic_order_cnt_type 2 (no extra fields)
    w.put_ue(1)  # max_num_ref_frames
    w.put(0, 1)  # no frame_num gaps
    w.put_ue(w_mbs - 1)
    w.put_ue(h_mbs - 1)
    w.put(1, 1)  # frame_mbs_only
    w.put(0, 1)  # direct_8x8_inference
    if crop_right or crop_bottom:
        w.put(1, 1)
        w.put_ue(0)
        w.put_ue(crop_right)
        w.put_ue(0)
        w.put_ue(crop_bottom)
    else:
        w.put(0, 1)
    w.put(0, 1)  # no VUI
    return w.rbsp()


def build_pps() -> bytes:
    w = _BitWriter()
    w.put_ue(0)  # pps id
    w.put_ue(0)  # sps id
    w.put(0, 1)  # CAVLC
    w.put(0, 1)  # no pic_order_present
    w.put_ue(0)  # one slice group
    w.put_ue(0)  # num_ref_idx_l0_minus1
    w.put_ue(0)  # num_ref_idx_l1_minus1
    w.put(0, 3)  # weighted pred flags
    w.put_se(0)  # pic_init_qp_minus26
    w.put_se(0)  # pic_init_qs_minus26
    w.put_se(0)  # chroma_qp_index_offset
    w.put(0, 3)  # deblock/constrained/redundant flags
    return w.rbsp()


def build_slice(slice_type: int, frame_num: int, filler: bytes) -> bytes:
    """Slice-header prefix + deterministic fake slice payload (the
    entropy-coded data a metadata pass never touches). The filler's
    zero runs FORCE emulation-prevention escapes on the wire."""
    w = _BitWriter()
    w.put_ue(0)  # first_mb_in_slice
    w.put_ue(slice_type)
    w.put_ue(0)  # pps id
    w.put(frame_num, 4)
    return w.rbsp() + filler


def build_annexb_stream(doc_id: int) -> bytes:
    """Deterministic Annex-B fixture for ``doc_id``: one baseline SPS
    (grid 1+id%5 × 1+id%3 mbs, crop right id%2 / bottom id%3==0),
    one PPS, then 3+id%6 frames — IDR every 5th (slice_type 7 = all-I)
    with frame_num resetting at each IDR (i%5, 4-bit field), non-IDR
    I at i%4==0, P otherwise. Slice filler opens with a zero run so
    the wire form REQUIRES 00 00 03 escapes (every stream has at
    least one slice long enough to force one)."""
    w_mbs, h_mbs = 1 + doc_id % 5, 1 + doc_id % 3
    out = [
        _nal(3, NAL_SPS, build_sps(w_mbs, h_mbs, doc_id % 2, 1 if doc_id % 3 == 0 else 0)),
        _nal(3, NAL_PPS, build_pps()),
    ]
    n_frames = 3 + doc_id % 6
    for i in range(n_frames):
        idr = i % 5 == 0
        stype = 7 if (idr or i % 4 == 0) else 5
        # filler opens with 00 00 followed by a byte ≤ 2 whenever it
        # is long enough — FORCING a 00 00 03 escape on the wire —
        # and ends nonzero (the spec's stop-bit guarantee that a NAL
        # never ends in 0x00, which is what keeps trailing zeros
        # unambiguous against the next start code's leading zeros)
        n_fill = 3 + (doc_id + i) % 5
        filler = (
            b"\x00\x00"
            + bytes((doc_id + i + j) % 3 for j in range(n_fill - 3))
            + b"\x80"
        )
        out.append(
            _nal(3 if idr else 2, NAL_IDR if idr else NAL_SLICE,
                 build_slice(stype, i % 5, filler))
        )
    return b"".join(out)


def build_avcc_config(sps_rbsp: bytes, pps_rbsp: bytes, nal_length_size: int = 4) -> bytes:
    """Assemble an AVCDecoderConfigurationRecord around one SPS and
    one PPS — the writer-side twin of :func:`parse_avcc_config`."""
    sps_nal = bytes([(3 << 5) | NAL_SPS]) + ebsp_escape(sps_rbsp)
    pps_nal = bytes([(3 << 5) | NAL_PPS]) + ebsp_escape(pps_rbsp)
    return (
        bytes([1, sps_rbsp[0], sps_rbsp[1], sps_rbsp[2],
               0xFC | (nal_length_size - 1), 0xE0 | 1])
        + struct.pack(">H", len(sps_nal)) + sps_nal
        + bytes([1])
        + struct.pack(">H", len(pps_nal)) + pps_nal
    )


# ---------------------------------------------------------------------------
# q152: the registered query
# ---------------------------------------------------------------------------


def synth_h264_payloads(ids_df: DataFrame) -> DataFrame:
    from .multimodal import spread_ids

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [build_annexb_stream(int(d)) for d in pdf["doc_id"]],
                }
            )

    return spread_ids(ids_df.select("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


H264_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, n_nals int, n_idr int, "
    "n_i int, n_p int, sum_frame_num bigint, slice_rbsp_bytes bigint"
)


def h264_stream_stats(binary_df: DataFrame) -> DataFrame:
    """Annex-B metadata index per payload, Arrow-batched: resolution
    from the SPS parse, IDR density and I/P mix from the slice-header
    prefixes, frame_num sum as an order checksum, and the RBSP byte
    total that breaks if emulation prevention is mishandled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("doc_id", "width", "height", "n_nals", "n_idr", "n_i", "n_p",
                "sum_frame_num", "slice_rbsp_bytes")
        for pdf in batches:
            out = {k: [] for k in cols}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                ix = stream_index(bytes(p))
                out["doc_id"].append(int(d))
                for k in cols[1:]:
                    out[k].append(int(ix[k]))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, schema=H264_STATS_SCHEMA)


_H264_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         1 + doc_id % 5 AS w_mbs,
         1 + doc_id % 3 AS h_mbs,
         doc_id % 2 AS crop_r,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS crop_b,
         3 + doc_id % 6 AS n_frames
  FROM documents
), frames AS (
  SELECT d.doc_id, f.i,
         CASE WHEN f.i % 5 = 0 THEN 1 ELSE 0 END AS idr,
         CASE WHEN f.i % 5 = 0 OR f.i % 4 = 0 THEN 1 ELSE 0 END AS is_i,
         f.i % 5 AS frame_num,
         -- slice RBSP: 2 header bytes (11/13 bits + stop, padded)
         -- + filler of 3 + (doc_id + i) % 5 bytes
         2 + 3 + (d.doc_id + f.i) % 5 AS rbsp_bytes
  FROM dims d, (SELECT unnest(range(8)) AS i) f
  WHERE f.i < d.n_frames
)
SELECT d.doc_id,
       CAST(16 * d.w_mbs - 2 * d.crop_r AS INT) AS width,
       CAST(16 * d.h_mbs - 2 * d.crop_b AS INT) AS height,
       CAST(2 + d.n_frames AS INT) AS n_nals,
       CAST(SUM(f.idr) AS INT) AS n_idr,
       CAST(SUM(f.is_i) AS INT) AS n_i,
       CAST(SUM(1 - f.is_i) AS INT) AS n_p,
       CAST(SUM(f.frame_num) AS BIGINT) AS sum_frame_num,
       CAST(SUM(f.rbsp_bytes) AS BIGINT) AS slice_rbsp_bytes
FROM dims d JOIN frames f USING (doc_id)
GROUP BY d.doc_id, d.w_mbs, d.h_mbs, d.crop_r, d.crop_b, d.n_frames
ORDER BY d.doc_id
"""


@register(
    "q152_h264_nal_stats",
    oracle=_H264_ORACLE,
    doc="H.264 Annex-B stream INDEXING (round-10 third pass — the "
    "video-side metadata layer a frame-sampling pipeline needs at "
    "ingest, while full H.264 pixel decode stays the documented "
    "seam): deterministic spec-shaped streams (baseline SPS with a "
    "4:2:0 crop rectangle, PPS, IDR-every-5 slice cadence with "
    "frame_num resetting at IDRs, filler bytes cycling 0,1,2 so the "
    "wire form REQUIRES 00 00 03 emulation-prevention escapes) are "
    "parsed back from the spec alone: start-code walk, NAL header "
    "split, EBSP→RBSP unescape, exp-Golomb SPS parse to the true "
    "cropped resolution, slice-header prefix parse to IDR/I/P "
    "counts and the frame_num checksum. slice_rbsp_bytes breaks if "
    "emulation prevention is mishandled; width/height break if the "
    "ue(v) reader or crop-unit arithmetic drifts. Plan shape as the "
    "codec family: ids fan-out + two MapInPandas + presentation "
    "sort; payload bytes never shuffle.",
)
def q152_h264_nal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    from . import h264 as _m, multimodal as _mm
    payloads = _mm.cached_payloads(spark, sf_dir, "h264152", synth_h264_payloads, d, (_m,))
    return h264_stream_stats(payloads).orderBy("doc_id")
