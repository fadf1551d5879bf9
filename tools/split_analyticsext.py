#!/usr/bin/env python3
"""One-shot mechanical split of operators/AnalyticsExt.scala (r8 task:
no file >4k lines): top-level members move verbatim into three mixin
traits self-typed to the object, so every cross-reference and every
external call site (`AnalyticsExt.foo`) is unchanged. Top-level
`private` members widen to `private[operators]` (trait-to-trait
visibility); bodies are not touched.
"""
import re
from pathlib import Path

SRC = Path("src/main/scala/graft/operators/AnalyticsExt.scala")
lines = SRC.read_text().splitlines()

obj = next(i for i, l in enumerate(lines) if l.startswith("object AnalyticsExt {"))
assert lines[-1] == "}"
head = lines[:obj]                    # package + imports + object scaladoc
body = lines[obj + 1 : -1]

# member starts: top-level defs/vals at 2-space indent
member_re = re.compile(r"^  (?:private(?:\[\w+\])? )?(?:final )?(?:def|val|lazy val|var|object) ")
starts = [i for i, l in enumerate(body) if member_re.match(l)]
# pull each member's preceding scaladoc/comment/blank run into its block
blocks, bounds = [], starts + [len(body)]
adj = []
for s in starts:
    t = s
    while t > 0 and re.match(r"^\s*(\*|/\*\*|\*/|//|$)", body[t - 1]) and (t - 1) not in starts:
        t -= 1
    adj.append(t)
adj[0] = 0
for a, b in zip(adj, adj[1:] + [len(body)]):
    blocks.append(body[a:b])

# widen top-level private members for trait-to-trait visibility
def widen(block):
    out = list(block)
    for i, l in enumerate(out):
        if l.startswith("  private def ") or l.startswith("  private val "):
            out[i] = l.replace("  private ", "  private[operators] ", 1)
    return out

blocks = [widen(b) for b in blocks]

# cut into 3 parts at member boundaries by line budget
total = sum(len(b) for b in blocks)
parts, cur, acc = [[], [], []], 0, 0
for b in blocks:
    if cur < 2 and acc + len(b) > total * (cur + 1) / 3:
        cur += 1
    parts[cur].extend(b)
    acc += len(b)

names = ["AnalyticsExtGraph", "AnalyticsExtStats", "AnalyticsExtOps"]
for name, content in zip(names, parts):
    text = "\n".join(
        head
        + [f"/** One third of the former monolithic AnalyticsExt object",
           "  * (r10 file-size refactor) — members are verbatim; the",
           "  * self-type keeps every cross-part reference resolving",
           "  * through the assembled object.",
           "  */",
           f"private[graft] trait {name} {{ this: AnalyticsExt.type =>"]
        + content + ["}", ""])
    Path(f"src/main/scala/graft/operators/{name}.scala").write_text(text)

SRC.write_text("\n".join(
    ["package graft.operators", "",
     "/** Extended warehouse / statistics / graph / process-mining",
     "  * operators — assembled from the three part traits (r10",
     "  * file-size refactor); call sites are unchanged.",
     "  */",
     "object AnalyticsExt extends AnalyticsExtGraph with AnalyticsExtStats with AnalyticsExtOps",
     ""]))
print({n: len(p) for n, p in zip(names, parts)})
