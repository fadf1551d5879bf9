#!/usr/bin/env python3
"""One-shot mechanical split of SparkEntry.scala (r8 verdict task: no
file >4k lines). The oracle-SQL map moves verbatim into per-domain
mixin traits; all shared helper defs/vals move into one helpers trait;
object SparkEntry keeps its public surface (entry/queries/oracleSql)
by mixing the traits back in. Entries are NOT reformatted — byte-equal
key/value pairs, so the driver's CORRECTNESS output is unchanged.
"""
import re
import sys
from pathlib import Path

SRC = Path("src/main/scala/graft/SparkEntry.scala")
OUT_DIR = Path("src/main/scala/graft/entry")

lines = SRC.read_text().splitlines()

# ---- region boundaries (verified against the current file) ----
def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit("marker not found")

queries_start = find(lambda l: l.startswith("  def queries:"))
queries_close = find(lambda l: l == "  )", queries_start)
oracle_start = find(lambda l: l.startswith("  def oracleSql:"))
oracle_close = find(lambda l: l == "  )", oracle_start)
assert lines[-1] == "}"

header = lines[: queries_close + 1]           # package..queries map incl close
helpers_a = lines[queries_close + 1 : oracle_start]
oracle_body = lines[oracle_start + 1 : oracle_close]
helpers_b = lines[oracle_close + 1 : -1]

# ---- split oracle entries ----
entry_re = re.compile(r'^    "([a-z0-9_]+)" ->')
starts = [i for i, l in enumerate(oracle_body) if entry_re.match(l)]
keys = [entry_re.match(oracle_body[i]).group(1) for i in starts]
assert len(starts) == 387, f"expected 387 entries, got {len(starts)}"

blocks = []
bounds = starts + [len(oracle_body)]
for n, (a, b) in enumerate(zip(bounds, bounds[1:])):
    blocks.append(oracle_body[a:b])

# move trailing comment/blank lines (they document the NEXT entry) —
# but never lines INSIDE an unterminated triple-quoted SQL string,
# where DuckDB's `//` integer division can open a line
def in_string(block, j):
    return sum(l.count('"""') for l in block[:j]) % 2 == 1

for i in range(len(blocks) - 1):
    moved = []
    while (blocks[i]
           and re.match(r"^\s*(//.*)?$", blocks[i][-1])
           and not in_string(blocks[i], len(blocks[i]) - 1)):
        moved.insert(0, blocks[i].pop())
    blocks[i + 1] = moved + blocks[i + 1]

# strip the separating comma from each entry's last non-blank line
def strip_comma(block, is_last):
    for j in range(len(block) - 1, -1, -1):
        if block[j].strip():
            if block[j].rstrip().endswith(","):
                block[j] = block[j].rstrip()[:-1]
            elif not is_last:
                raise SystemExit(f"entry does not end with comma: {block[j]!r}")
            return
for i, b in enumerate(blocks):
    strip_comma(b, i == len(blocks) - 1)

# ---- group by domain prefix ----
def group_of(key):
    for p, g in [("cdc_", "Cdc"), ("dedup_", "Dedup"), ("ann_", "Ann"),
                 ("text_", "Text"), ("mm_", "Mm")]:
        if key.startswith(p):
            return g
    assert key.startswith("q"), key
    return "Warehouse"

groups = {}
for k, b in zip(keys, blocks):
    groups.setdefault(group_of(k), []).append((k, b))

# Warehouse is the big one: split into two by cumulative line budget
wh = groups.pop("Warehouse")
total = sum(len(b) for _, b in wh)
acc, cut = 0, len(wh)
for i, (_, b) in enumerate(wh):
    acc += len(b)
    if acc > total // 2:
        cut = i + 1
        break
groups["WarehouseA"] = wh[:cut]
groups["WarehouseB"] = wh[cut:]

DOC = {
    "Cdc": "CDC core: envelope parses, SCD, compaction, IVM, audits",
    "Dedup": "LLM dedup family: exact/minhash/simhash/substring + scorecards",
    "Ann": "similarity search: brute force, LSH, IVF, PQ, graphs + recall curves",
    "Text": "text analysis + corpus statistics",
    "Mm": "multimodal binary-payload operators",
    "WarehouseA": "warehouse/OLAP + analytics oracles (first half, by map order)",
    "WarehouseB": "warehouse/OLAP + analytics oracles (second half, by map order)",
}

OUT_DIR.mkdir(exist_ok=True)
mixins = []
for g, entries in groups.items():
    name = f"Oracle{g}"
    mixins.append(name)
    body = []
    for j, (_, b) in enumerate(entries):
        body.extend(b)
        if j < len(entries) - 1:
            # restore the separating comma on the last non-blank line
            for t in range(len(body) - 1, -1, -1):
                if body[t].strip():
                    body[t] = body[t] + ","
                    break
    text = "\n".join(
        ["package graft", "", "import graft.operators._", "",
         f"/** {DOC[g]} — split verbatim out of SparkEntry.oracleSql",
         "  * (r10 file-size refactor); the assembled map is identical.",
         "  */",
         f"private[graft] trait {name} {{ this: SparkEntryOracleHelpers =>",
         f"  protected def oracle{g}: Map[String, String] = Map("]
        + body + ["  )", "}", ""])
    (OUT_DIR / f"{name}.scala").write_text(text)

# ---- helpers trait: private -> protected at top level ----
def widen(ls):
    out = []
    for l in ls:
        if l.startswith("  private def "):
            out.append("  protected def " + l[len("  private def "):])
        elif l.startswith("  private val "):
            out.append("  protected val " + l[len("  private val "):])
        else:
            out.append(l)
    return out

helpers = (
    ["package graft", "",
     "import graft.operators._", "",
     "/** Shared oracle-SQL builders and tuning constants used by both the",
     "  * queries map and the per-domain Oracle* traits — split verbatim out",
     "  * of SparkEntry (r10 file-size refactor).",
     "  */",
     "private[graft] trait SparkEntryOracleHelpers {"]
    + widen(helpers_a) + widen(helpers_b) + ["}", ""])
(OUT_DIR / "SparkEntryOracleHelpers.scala").write_text("\n".join(helpers))

# ---- new SparkEntry ----
obj_line = find(lambda l: l.startswith("object SparkEntry"))
header[obj_line] = ("object SparkEntry extends SparkEntryOracleHelpers\n    with "
                    + " with ".join(sorted(mixins)) + " {")
assembly = " ++ ".join(f"oracle{g}" for g in sorted(groups))
new_entry = header + [
    "",
    "  /** Assembled from the per-domain Oracle* traits — same 387",
    "    * key/value pairs the single literal carried before the split.",
    "    */",
    f"  def oracleSql: Map[String, String] = {assembly}",
    "}", ""]
SRC.write_text("\n".join(new_entry))
print("groups:", {g: (len(e), sum(len(b) for _, b in e)) for g, e in groups.items()})
print("ok")
