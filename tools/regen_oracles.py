#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/GeneratedOracles.scala from the output of
`sbt -batch "runMain graft.DumpOracles" > /tmp/oracles_raw.txt 2>&1`.

Run this after ANY intentional change to the golden corpus, the emitters, or
a generated-oracle query; then recompile, run graft.Verify, and check with
tools/oracle_check.py. Long sections are chunked to stay under the JVM 64 KB
string-constant limit.
"""
import re
import sys

RAW = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracles_raw.txt"
OUT = "src/main/scala/graft/GeneratedOracles.scala"
NAMES = {
    "kg_emit_arizona": "arizona",
    "kg_canonical_nodes": "canonicalNodes",
    "kg_emit_fries": "fries",
    "kg_fries_frames": "friesFrames",
    "dedup_simhash": "simhash",
    "text_fingerprint": "textFingerprint",
    "kg_emit_indexcard": "indexcard",
    "kg_emit_cmu": "cmu",
    "kg_emit_assembly": "assembly",
    "kg_emit_assembly_mitre": "assemblyMitre",
    "kg_emit_serial": "serial",
}

raw = open(RAW).read()
lines = [l[7:] if l.startswith("[info] ") else l for l in raw.split("\n")]
txt = "\n".join(lines)
sections, cur, buf = {}, None, []
for l in txt.split("\n"):
    m = re.match(r"==== (\S+) \(\d+ rows\) ====", l)
    if m:
        if cur:
            sections[cur] = "\n".join(buf).strip()
        cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(l)
if cur:
    sections[cur] = "\n".join(buf).strip()


def trim(s):
    idx = s.rindex("AS t(")
    return s[: s.index(")", idx) + 1]


for k in sections:
    sections[k] = trim(sections[k])

missing = set(NAMES) - set(sections)
if missing:
    sys.exit(f"missing sections in dump: {missing}")

out = [
    "package graft",
    "",
    "/** DuckDB VALUES oracles generated from the deterministic golden-corpus",
    '  * exports by [[DumpOracles]] (regenerate with `sbt "runMain graft.DumpOracles"`',
    "  * + tools/regen_oracles.py after any intentional behavior change). The",
    "  * golden corpus is hand-traced and pinned exactly by GoldenSpec, so these",
    "  * derived-export pins are real regression oracles: any drift in emitter",
    "  * or pipeline behavior flips the driver's CORRECTNESS row red.",
    "  *",
    "  * Long sections are emitted as concatenated line chunks to stay under the",
    "  * JVM 64 KB string-constant limit.",
    "  */",
    "object GeneratedOracles {",
]
for sec, valname in NAMES.items():
    body = sections[sec]
    chunks, curc, n = [], [], 0
    for l in body.split("\n"):
        if n + len(l) > 40000:
            chunks.append("\n".join(curc))
            curc, n = [], 0
        curc.append(l)
        n += len(l) + 1
    if curc:
        chunks.append("\n".join(curc))
    if len(chunks) == 1:
        out.append(f"  val {valname}: String =")
        out.append('"""' + chunks[0] + '"""')
    else:
        out.append(f"  val {valname}: String = List(")
        out.append(",\n".join('"""' + c + '"""' for c in chunks))
        out.append('  ).mkString("\\n")')
    out.append("")
out.append("}")
open(OUT, "w").write("\n".join(out))
print("wrote", OUT, {k: len(sections[k]) for k in sections})
