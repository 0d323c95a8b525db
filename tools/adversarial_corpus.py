#!/usr/bin/env python3
"""Build the adversarial text corpus (r14 verdict item 7): a documents
table stressing every assumption the typed text kernels make —
astral-plane chars (emoji, math alphanumerics), CJK with no
whitespace, combining accents, RTL scripts, control chars, a multi-MB
single doc, a half-MB single token, empty/whitespace/null texts, and
planted exact + near clones — with the OTHER nine tables copied from a
base SF dir so every graded query still runs.

The charset contract this corpus gates (SURVEY §3): text is UTF-8;
lengths and char classes count CODE POINTS; tokens are maximal
[a-z0-9] runs after Unicode lowercasing. Two constructs are outside
the parity contract and deliberately absent here:
  - U+0130 (İ): Java/Spark full casing lowers it to "i"+U+0307 while
    DuckDB's utf8proc simple casing gives "i" — token boundaries
    diverge when İ directly precedes an alphanumeric.
  - U+03A3 (Σ): Java/Spark apply the context-sensitive final-sigma
    rule (ς at word end), utf8proc maps to σ unconditionally. Either
    way both map out of [a-z0-9], so only fingerprint BYTES would
    diverge, not token content.

Usage: python3 tools/adversarial_corpus.py [baseSfDir] [outDir]
"""
import shutil
import sys
import pathlib
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]


def texts():
    """(text, lang, source) rows. None text is a real case.

    Size calibration: the outsized docs stress long-input behavior
    (the 60 KB single token reproduced the quadratic Java-regex
    backtracking r15 fixed in tx_pii_redact at ~4 s — the unbounded
    form was >70 s at 500 KB) while staying inside the DuckDB
    oracles' patience: the per-position SQL constructions (cdc
    rolling hash, winnow windows, suffix stride-1 spans) are minutes
    at megabyte doc sizes, which gates nothing — engine-side
    multi-MB robustness is covered by the bench corpus at sf1.
    """
    big = " ".join(
        f"tok{i % 977} filler{(i * 31) % 401} data" for i in range(8000))
    rows = [
        # astral plane: each emoji is ONE codepoint, TWO UTF-16 units
        ("hello \U0001F600\U0001F600 world \U0001F680 rocket test", "en", "src0"),
        # ZWJ family sequence: 7 codepoints incl. joiners
        ("\U0001F468‍\U0001F469‍\U0001F467‍\U0001F466 family emoji run", "en", "src0"),
        # math alphanumerics (plane 1) — NOT [a-z0-9], NOT [0-9]
        ("\U0001D54A\U0001D55D\U0001D552\U0001D55F\U0001D55C spark \U0001D7DD five", "en", "src1"),
        # CJK, no whitespace at all
        ("这是一个没有空格的中文句子讨论火车和桥梁与数据仓库", "zh", "src2"),
        # CJK mixed with ascii/digits
        ("中文word混合123数字text分析pipeline测试", "zh", "src2"),
        # combining accents (e + U+0301) vs precomposed
        ("café café naïve naïve facade test", "fr", "src3"),
        # RTL arabic + hebrew
        ("مرحبا بالعالم שלום עולם hello", "ar", "src4"),
        # greek/cyrillic lowercase (simple case mappings only)
        ("αβγ δεζ привет мир data", "el", "src4"),
        # german sharp s (1:1 lowercase)
        ("straße größer kleiner weg test", "de", "src5"),
        # control chars incl. vertical tab (class \s) and SOH (punct)
        ("abc verticaltab and\ttab\nnewline end", "en", "src5"),
        # empty, whitespace-only, null
        ("", "en", "src6"),
        ("   \t\n  ", "en", "src6"),
        (None, "en", "src6"),
        # 60 KB single token (no separators)
        ("x" * 60000, "en", "src7"),
        # ~170 KB doc, repetitive structure for line dedup
        (big, "en", "src8"),
        # planted EXACT unicode clones (dd_exact must pair them)
        ("重复 duplicate \U0001F600 content block alpha", "zh", "src9"),
        ("重复 duplicate \U0001F600 content block alpha", "zh", "src10"),
        ("重复 duplicate \U0001F600 content block alpha", "zh", "src11"),
        # near-dup pair (one token differs) for jaccard tiers
        ("the quick brown fox jumps over the lazy dog near the old bridge every day", "en", "src12"),
        ("the quick brown fox jumps over the lazy cat near the old bridge every day", "en", "src12"),
    ]
    # ballast: enough plain ASCII docs that corpus-level stats queries
    # exercise their normal paths too
    for i in range(60):
        rows.append((
            " ".join(f"word{(i * 17 + j) % 211} term{(j * 13) % 97} the data of and to in"
                     for j in range(12 + i % 9)),
            ["en", "fr", "es", "de", "zh"][i % 5],
            f"src{i % 20}"))
    # ---- media edges (r16, r15 verdict item 9) ----
    # The multimodal kernels read documents.text CAST TO BINARY
    # (MultimodalOps.asMedia), and mm_mime_sniff passes doc_id%7==0
    # payloads through RAW (unframed). Magic-header rows are therefore
    # PINNED to indices ≡ 0 (mod 7) so the sniffer sees their leading
    # bytes untouched: full ASCII-representable magics (GIF8, RIFF/WAVE,
    # ftyp at bytes 5-8), TRUNCATED magics (RIF, RIFF without WAVE,
    # bare GIF8), and 1-byte payloads. Non-ASCII magics (JPEG FF D8,
    # PNG 89 50) cannot round-trip through a UTF-8 text column — the
    # framed branch covers those detections. Zero-length and NULL
    # payloads already exist above (empty/whitespace/None texts).
    def at_mod7(text, lang="en", source="srcm"):
        while len(rows) % 7 != 0:
            rows.append((f"media filler pad {len(rows)} data and the of", "en", "srcm"))
        rows.append((text, lang, source))
    at_mod7("GIF87a looks like a gif header but is plain text data")
    at_mod7("RIFF\x00\x00\x00\x00WAVEfmt pcm-ish audio bytes follow here")
    at_mod7("0123ftypisom an mp4-shaped prefix in a text column")
    at_mod7("RIF")                      # truncated magic: 3 bytes
    at_mod7("RIFF0000DATA not wave")    # RIFF without WAVE at bytes 9-12
    at_mod7("GIF8")                     # exact 4-byte magic, nothing after
    at_mod7("R")                        # 1-byte payload

    # ---- r17: frame-sample + embed-stub edges (r16 verdict item 10) ----
    # mm_frame_sample consumes only doc_id % 3 == 2 (video) payloads,
    # and mm_embed_ann byte-histograms EVERY payload. Pin a NULL, a
    # 1-byte, and 100-byte-boundary payloads to video positions so the
    # frame arithmetic and the null-doc contract are exercised on the
    # branch that reads them.
    def at_mod3_2(text, lang="en", source="srcv"):
        while len(rows) % 3 != 2:
            rows.append((f"video filler pad {len(rows)} data and of", "en", "srcv"))
        rows.append((text, lang, source))
    at_mod3_2(None)          # null video payload: not a file, no frames
    at_mod3_2("Q")           # 1-byte video: exactly one frame (idx 0)
    at_mod3_2("f" * 99)      # 99 bytes: still a single frame
    at_mod3_2("g" * 100)     # 100 bytes: two frames, sampling keeps idx 0
    at_mod3_2("h" * 201)     # 201 bytes: three frames, samples idx 0 and 2
    return rows


def main(base, out):
    outp = pathlib.Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        shutil.copyfile(f"{base}/{t}.parquet", outp / f"{t}.parquet")
    rows = texts()
    tbl = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        # python len() counts codepoints — the contract's unit
        "n_chars": pa.array([len(r[0]) if r[0] is not None else 0 for r in rows],
                            pa.int64()),
    })
    pq.write_table(tbl, outp / "documents.parquet")
    print(f"wrote {outp}/documents.parquet: {tbl.num_rows} docs "
          f"({sum(len(r[0]) for r in rows if r[0]) / 1e6:.1f} M codepoints)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfadv")
