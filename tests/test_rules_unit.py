"""Rule-level unit tests (SURVEY.md §5.1): pure-Python stat functions
and the scrub core on crafted strings — no Spark needed."""

from __future__ import annotations

from wtq.rules import heuristics as H
from wtq.rules import registry as R
from wtq.rules.langid import predict_lang
from wtq.rules.perplexity import char_perplexity
from wtq.rules.scrub import scrub_text


def test_registry_codes_unique():
    codes = [r.code for r in R.RULES]
    assert len(codes) == len(set(codes))


def test_py_stats_basics():
    s = H.py_stats("the cat sat on the mat")
    assert s["n_words"] == 6
    assert abs(s["mean_word_len"] - (3 + 3 + 3 + 2 + 3 + 3) / 6) < 1e-12
    assert s["stopword_frac"] == 3 / 6  # 'the' ×2 + 'on'


def test_rep_line_frac():
    text = "aaaa\nbbbb\naaaa"
    # 'aaaa' occurs twice → 4 duplicate chars of 12 total
    assert abs(H.py_rep_line_frac(text) - 4 / 12) < 1e-12
    assert H.py_rep_line_frac("x\ny\nz") == 0.0
    assert H.py_rep_line_frac("") == 0.0


def test_top_word_frac():
    assert H.py_top_word_frac("a a a b") == 3 / 4
    assert H.py_top_word_frac("") == 0.0


def test_dup_para_frac():
    text = "para one\n\npara two\n\npara one"
    # 'para one' (8 chars) twice → 8 excess of 24 total para chars
    assert abs(H.py_dup_para_frac(text) - 8 / 24) < 1e-12
    assert H.py_dup_para_frac("a\n\nb\n\nc") == 0.0
    assert H.py_dup_para_frac("") == 0.0
    # single-paragraph text (no \n\n) can never fire
    assert H.py_dup_para_frac("just one paragraph") == 0.0


def test_top_ngram_frac():
    words = "a b a b x".split()
    # 2-grams: (a,b)×2 (b,a)×1 (b,x)×1 → top = (a,b): 2 occ × 2 chars / 5 total
    assert abs(H.py_top_ngram_frac(words, 2) - 2 * 2 / 5) < 1e-12
    # fewer words than n → 0
    assert H.py_top_ngram_frac(["a"], 2) == 0.0
    assert H.py_top_ngram_frac([], 3) == 0.0


def test_dup_ngram_frac():
    # 'a b c d e' ×3 glued: the 5-gram (a,b,c,d,e) occurs 3 times
    words = "a b c d e a b c d e a b c d e".split()
    f = H.py_dup_ngram_frac(words, 5)
    # every 5-gram window that repeats contributes; at minimum the
    # (a..e) gram's 2 excess occurrences × 5 chars over 15 total chars
    assert f >= 2 * 5 / 15
    # unique text → 0
    assert H.py_dup_ngram_frac(list("abcdefghij"), 5) == 0.0


def test_repetition_rules_fire():
    # dominant 2-gram: 'buy now' repeated 30× (60 words, passes Q-1)
    stats = H.py_stats(" ".join(["buy now"] * 30))
    fired = H.py_fired_rules(stats, lang_mismatch=False, ppl=0.0, profanity_hits=0)
    assert {"Q-14", "Q-15", "Q-16", "Q-17", "Q-18", "Q-19", "Q-20", "Q-21", "Q-22"} <= set(fired)
    # duplicated paragraphs
    para = "some unique paragraph text here"
    stats = H.py_stats((para + "\n\n") * 3 + "tail")
    fired = H.py_fired_rules(stats, lang_mismatch=False, ppl=0.0, profanity_hits=0)
    assert "Q-13" in fired
    # clean prose fires none of the repetition family
    clean = "the quick brown fox jumps over the lazy dog and then " \
            "walks along the river bank toward a small village market"
    stats = H.py_stats(clean)
    fired = H.py_fired_rules(stats, lang_mismatch=False, ppl=0.0, profanity_hits=0)
    assert not set(fired) & {c for c, _, _ in R.REPETITION_RULES}


def test_cascaded_repetition_stats_equal_reference_forms():
    """The interned/cascaded fast path in py_stats must be value-equal
    to the simple per-n definitions, including on tie-heavy and
    degenerate inputs."""
    import random

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "dd", "e", "fff", "gg"]
    cases = [
        "",
        "one",
        "x y",
        "a a a a a a",
        "spam ham spam ham spam ham spam ham spam ham",
        ("p q r s t u v w " * 4).strip(),  # repeated 8-word block
    ] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 60)))
        for _ in range(200)
    ]
    for text in cases:
        words = H.py_words(text)
        got = H._py_repetition_stats(words)
        for n in (2, 3, 4):
            assert got[f"top_{n}gram_frac"] == H.py_top_ngram_frac(words, n), (text, n)
        for n in range(5, 11):
            assert got[f"dup_{n}gram_frac"] == H.py_dup_ngram_frac(words, n), (text, n)


def test_cascaded_repetition_stats_equal_reference_forms_hypothesis():
    """Property form of the equivalence: arbitrary word sequences from
    a small alphabet (maximizing collisions/ties) over varied word
    lengths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.sampled_from(["a", "bb", "ccc", "d", "ee", "a b"]), max_size=40))
    def check(tokens):
        # "a b" injects a token that SPLITS into two words, covering
        # multi-word interactions of the text round-trip too
        words = H.py_words(" ".join(tokens))
        got = H._py_repetition_stats(words)
        for n in (2, 3, 4):
            assert got[f"top_{n}gram_frac"] == H.py_top_ngram_frac(words, n)
        for n in range(5, 11):
            assert got[f"dup_{n}gram_frac"] == H.py_dup_ngram_frac(words, n)

    check()


def test_repetition_rules_in_registry():
    codes = {r.code for r in R.RULES}
    assert {c for c, _, _ in R.REPETITION_RULES} <= codes


def test_fired_rules_thresholds():
    stats = H.py_stats("word " * 5)  # 5 words < MIN_WORDS
    fired = H.py_fired_rules(stats, lang_mismatch=False, ppl=0.0, profanity_hits=0)
    assert "Q-1" in fired
    stats = H.py_stats(" ".join(["ok"] * 30))
    fired = H.py_fired_rules(stats, lang_mismatch=True, ppl=R.PPL_MAX + 1, profanity_hits=2)
    assert {"L-1", "P-1", "T-1"} <= set(fired)


def test_scrub_pii():
    r = scrub_text("mail me at bob.smith+x@exa-mple.co or (212) 555-1234 or 10.0.0.1 damn it")
    assert "[EMAIL]" in r.text and "[PHONE]" in r.text and "[IP]" in r.text and "[CENSORED]" in r.text
    assert (r.n_email, r.n_phone, r.n_ip, r.n_profanity) == (1, 1, 1, 1)
    assert "@" not in r.text


def test_scrub_precheck_equals_raw_regex_form():
    """The fast-path pre-checks must be invisible: scrub_text ==
    running the four subn() calls unconditionally, INCLUDING on
    adversarial Unicode where (?i) full case folding matches ASCII
    lexicon words through non-ASCII characters (the review-caught
    evasion: lower()-substring pre-checks are unsound off-ASCII)."""
    import wtq.rules.scrub as S

    def raw(t):
        out, a = S.EMAIL_RE.subn(S.EMAIL_TOKEN, t)
        out, b = S.PHONE_RE.subn(S.PHONE_TOKEN, out)
        out, c = S.IPV4_RE.subn(S.IP_TOKEN, out)
        out, d = S.PROFANITY_RE.subn(S.PROFANITY_TOKEN, out)
        return S.ScrubResult(out, a, b, c, d)

    cases = [
        "", "no pii at all", "a@b.co", "(212) 555-1234", "10.0.0.1", "damn",
        "mixed a@b.co 10.0.0.1 (212) 555-1234 damn",
        # Unicode case-folding evasions (must still be censored)
        "baſtard", "İDİOT", "ſ damn ſ", "ÉMAIL notanemail",
        # non-ASCII text with no profanity (regex path, no match)
        "texte français sans gros mots é ü ñ",
    ]
    for t in cases:
        assert scrub_text(t) == raw(t), t


def test_scrub_idempotent(pages_pdf):
    """scrub(scrub(x)) == scrub(x) byte-for-byte (SURVEY.md §5.4)."""
    for t in pages_pdf["text"].head(100):
        once = scrub_text(t).text
        twice = scrub_text(once).text
        assert once.encode() == twice.encode()


def test_scrub_no_pii_left(pages_pdf):
    import re
    for t in pages_pdf["text"]:
        out = scrub_text(t).text
        assert not re.search(r"@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", out)


def test_langid_on_clean_samples():
    assert predict_lang("the cat and the dog were in the house with one of them")[0] == "en"
    assert predict_lang("le chat et le chien sont dans la maison avec les autres")[0] == "fr"
    assert predict_lang("der hund und die katze sind in dem haus mit einer von")[0] == "de"
    assert predict_lang("的一是不了人我在有他这中大来上")[0] == "zh"
    assert predict_lang("")[0] == "und"


def test_perplexity_separates_gibberish():
    clean = char_perplexity("the data table query row scan filter join merge sort")
    gib = char_perplexity("xqzwv kjhgfd pqzxw vbnmk qwzxc plmkj")
    assert clean < R.PPL_MAX < gib


def test_ppm_roundtrip_and_resize():
    """Real codec contract: encode → decode is byte-lossless (incl. a
    header comment), block-mean resize halves dimensions exactly."""
    import numpy as np

    from wtq.operators.multimodal import (
        block_mean_resize,
        decode_ppm,
        encode_ppm,
        synth_image,
    )

    img = synth_image(123)
    blob = encode_ppm(img)
    assert np.array_equal(decode_ppm(blob), img)
    # decoder must skip header comments like a real PPM reader
    commented = blob.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(decode_ppm(commented), img)
    small = block_mean_resize(img)
    assert small.shape == (8, 8, 3)
    assert small[0, 0, 0] == img[:2, :2, 0].astype(float).mean()
    import pytest

    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM rejected


def test_wav_roundtrip():
    """Real RIFF codec contract: encode → decode is lossless, unknown
    chunks are skipped, malformed input rejected."""
    import struct

    import numpy as np
    import pytest

    from wtq.operators.multimodal import decode_wav, encode_wav, synth_audio

    s = synth_audio(77)
    blob = encode_wav(s)
    out, rate = decode_wav(blob)
    assert rate == 8000 and np.array_equal(out, s)
    # insert an unknown LIST chunk between fmt and data — decoder must skip it
    fmt_end = blob.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = blob[:fmt_end] + extra + blob[fmt_end:]
    out2, _ = decode_wav(patched)
    assert np.array_equal(out2, s)
    with pytest.raises(ValueError):
        decode_wav(b"RIFXxxxxWAVE")


def test_video_stream_frame_walk():
    import numpy as np

    from wtq.operators.multimodal import (
        encode_video,
        iter_video_frames,
        synth_video,
    )

    frames = synth_video(5)
    blob = encode_video(frames)
    out = list(iter_video_frames(blob))
    assert len(out) == len(frames)
    for a, b in zip(out, frames):
        assert np.array_equal(a, b)


def test_signature_batches_edge_inputs():
    """Sentinel contracts for degenerate docs: empty/short texts get
    the sentinel minhash signature and a NULL simhash (out-of-band —
    a real all-votes-≤0 document can legitimately hash to 0, so 0 is
    NOT the sentinel), None is tolerated, and both batches are
    deterministic."""
    from wtq.operators.dedup import MINHASH_P, N_PERM, _sig_batch, _simhash_batch

    texts = ["", "one two", None, "one two three four five", "  ", "one two three"]
    sigs = _sig_batch(texts)
    sims = _simhash_batch(texts)
    assert sigs[0] == [MINHASH_P] * N_PERM and sims[0] is None
    assert sigs[1] == [MINHASH_P] * N_PERM and sims[1] is None  # < k words
    assert sigs[2] == [MINHASH_P] * N_PERM and sims[2] is None  # None
    assert sigs[3] != [MINHASH_P] * N_PERM and sims[3] is not None
    assert sigs == _sig_batch(texts) and sims == _simhash_batch(texts)
    # one-shingle doc: signature defined, non-null
    assert sims[5] is not None and max(sigs[5]) < MINHASH_P


def test_image_quarantine_conservation(spark):
    """Corrupt blobs land in quarantine with an error code; good rows
    decode exactly as the direct path; nothing is lost or duplicated
    (good + quarantined = input) and no task fails."""
    import numpy as np

    from wtq.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        image_features_safe,
        quarantine_split,
        synth_image,
    )

    good = {i: encode_ppm(synth_image(i)) for i in range(4)}
    bad = {
        10: b"",  # empty
        11: b"JFIF garbage not a ppm at all",  # wrong magic
        12: encode_ppm(synth_image(12))[:-50],  # truncated raster
        13: b"P6\n16 16\n255\n",  # header only, no raster
        14: b"P6\n999999999 999999999\n255\n\x00\x01",  # absurd dims
    }
    rows = [(i, b) for i, b in {**good, **bad}.items()]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    feats = image_features_safe(df)
    ok, quar = quarantine_split(feats)
    ok_rows = {r.doc_id: r for r in ok.collect()}
    quar_rows = {r.doc_id: r for r in quar.collect()}
    # conservation
    assert set(ok_rows) == set(good) and set(quar_rows) == set(bad)
    assert len(ok_rows) + len(quar_rows) == len(rows)
    # good rows match the direct decode exactly
    for i, blob in good.items():
        img = decode_ppm(blob)
        assert ok_rows[i].width == 16 and ok_rows[i].height == 16
        assert ok_rows[i].mean_r == round(float(img[:, :, 0].astype(np.float64).mean()), 6)
        assert ok_rows[i].err is None
    # quarantined rows carry an error code and null features
    for i in bad:
        assert quar_rows[i].err and not quar_rows[i].ok
        assert quar_rows[i].width is None and quar_rows[i].mean_r is None


def test_png_roundtrip_rgb_rgba_gray():
    import numpy as np

    from wtq.operators.multimodal import decode_image, decode_png, encode_png, synth_image

    rgb = synth_image(7)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    assert np.array_equal(decode_image(encode_png(rgb)), rgb)  # dispatch
    rgba = np.dstack([rgb, np.full(rgb.shape[:2], 200, np.uint8)])
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)
    gray = rgb[:, :, 0]
    assert np.array_equal(decode_png(encode_png(gray)), gray)


def test_png_all_five_filters_reconstruct():
    """The encoder emits filter 0 only, so exercise filters 1-4 by
    constructing the IDAT by hand: filter each scanline with an
    independent scalar reference implementation of the PNG spec, then
    require the decoder to reconstruct the original raster."""
    import struct
    import zlib

    import numpy as np

    from wtq.operators.multimodal import PNG_SIG, _paeth, _png_chunk, decode_png, synth_image

    img = synth_image(11)  # (16, 16, 3)
    h, w, ch = img.shape
    stride = w * ch
    raw = img.reshape(h, stride).astype(int)
    scan = b""
    for y in range(h):
        ftype = y % 5
        prev = raw[y - 1] if y > 0 else np.zeros(stride, int)
        line = bytearray()
        for x in range(stride):
            cur = raw[y][x]
            a = raw[y][x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: _paeth(a, b, c)}[ftype]
            line.append((cur - pred) & 0xFF)
        scan += bytes([ftype]) + bytes(line)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), img)


def test_png_malformed_raises_for_quarantine():
    import pytest

    from wtq.operators.multimodal import decode_image, decode_png, encode_png, synth_image

    blob = bytearray(encode_png(synth_image(3)))
    blob[40] ^= 0xFF  # corrupt inside a chunk payload -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")
    # malformed JPEG raises into quarantine; unknown containers are errors
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a...")


def test_image_quarantine_mixed_formats(spark):
    """One safe-decode pass over MIXED containers: PPM and PNG rows
    extract for real, a corrupt PNG and a JPEG-magic blob quarantine,
    and conservation holds."""
    import numpy as np

    from wtq.operators.multimodal import (
        encode_png,
        encode_ppm,
        image_features_safe,
        quarantine_split,
        synth_image,
    )

    bad_png = bytearray(encode_png(synth_image(2)))
    bad_png[40] ^= 0xFF
    rows = [
        (0, bytes(encode_ppm(synth_image(0)))),
        (1, bytes(encode_png(synth_image(1)))),
        (2, bytes(bad_png)),
        (3, b"\xff\xd8\xff\xe0 jpeg-magic"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    feats = image_features_safe(df)
    ok, quar = quarantine_split(feats)
    ok_rows = {r.doc_id: r for r in ok.collect()}
    quar_rows = {r.doc_id: r for r in quar.collect()}
    assert set(ok_rows) == {0, 1} and set(quar_rows) == {2, 3}
    # the PPM and PNG rasters of the same synth id agree on mean_r
    img0, img1 = synth_image(0), synth_image(1)
    assert ok_rows[0].mean_r == round(float(np.float64(img0[:, :, 0].mean())), 6)
    assert ok_rows[1].mean_r == round(float(np.float64(img1[:, :, 0].mean())), 6)
    assert "CRC" in quar_rows[2].err
    assert "ValueError" in quar_rows[3].err  # malformed JPEG (round 5: real decoder)


def test_png_filter_roundtrip_hypothesis():
    """Property: ANY uint8 raster, re-encoded with ANY per-row filter
    assignment, decodes back to the original — the filters are exact
    bijections given correct predictor arithmetic."""
    import struct
    import zlib

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from wtq.operators.multimodal import PNG_SIG, _paeth, _png_chunk, decode_png

    @settings(max_examples=30, deadline=None)
    @given(
        arr=arrays(np.uint8, st.tuples(st.integers(1, 6), st.integers(1, 6), st.just(3))),
        fseed=st.integers(0, 2**30),
    )
    def check(arr, fseed):
        h, w, ch = arr.shape
        stride = w * ch
        raw = arr.reshape(h, stride).astype(int)
        scan = b""
        for y in range(h):
            ftype = (fseed >> (2 * y)) % 5
            prev = raw[y - 1] if y > 0 else np.zeros(stride, int)
            line = bytearray()
            for x in range(stride):
                a = raw[y][x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: _paeth(a, b, c)}[ftype]
                line.append((raw[y][x] - pred) & 0xFF)
            scan += bytes([ftype]) + bytes(line)
        blob = (
            PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(scan))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(blob), arr)

    check()
