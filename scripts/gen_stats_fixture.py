"""Generate the Stats-CEB-grammar fixture corpus (146 queries).

The genuine Stats-CEB workload (Han et al., "Cardinality Estimation in
DBMS: A Comprehensive Benchmark Evaluation", PVLDB 15(4), 2021) is 146
COUNT(*) conjunctive queries over the Stack-Exchange-stats schema; the
reference fetches it from a public archive at runtime (ref
``postbound/workloads.py:46-53``). This sandbox has no network access,
so this script deterministically generates a corpus in the SAME grammar
over the SAME schema — ``table as alias`` spelling, equi-joins through
``Id``/``PostId``/``UserId``/``OwnerUserId``/``RelatedPostId``/
``ExcerptPostId``, numeric range predicates, and Postgres-style
``'...'::timestamp`` literal casts — committed as per-query ``*.sql``
fixture files. It is a shaped stand-in, not a transcription: with
network, ``workloads.stats(real=True, prefer_fixture=False)`` fetches
the canonical texts, which take precedence.

Run from the repo root: ``python scripts/gen_stats_fixture.py``
(idempotent — fixed seed, rewrites the same 146 files).
"""

from __future__ import annotations

import os
import random

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "workloads", "fixtures", "stats")

# The real Stats schema: table -> (alias, numeric columns with value ranges,
# timestamp columns, join spec to reach users/posts).
NUM = {
    "users": [("Reputation", 1, 1000), ("Views", 0, 500), ("UpVotes", 0, 500),
              ("DownVotes", 0, 50)],
    "posts": [("PostTypeId", 1, 7), ("Score", -5, 100), ("ViewCount", 0, 8000),
              ("AnswerCount", 0, 10), ("CommentCount", 0, 20),
              ("FavoriteCount", 0, 50)],
    "comments": [("Score", 0, 20)],
    "votes": [("VoteTypeId", 1, 15), ("BountyAmount", 0, 500)],
    "badges": [],
    "postHistory": [("PostHistoryTypeId", 1, 20)],
    "postLinks": [("LinkTypeId", 1, 3)],
    "tags": [("Count", 0, 1000)],
}
TS = {
    "users": "CreationDate", "posts": "CreationDate", "comments": "CreationDate",
    "votes": "CreationDate", "badges": "Date", "postHistory": "CreationDate",
    "postLinks": "CreationDate", "tags": None,
}
# how each satellite reaches the two hub tables
TO_USERS = {"posts": "OwnerUserId", "comments": "UserId", "votes": "UserId",
            "badges": "UserId", "postHistory": "UserId"}
TO_POSTS = {"comments": "PostId", "votes": "PostId", "postHistory": "PostId",
            "postLinks": "PostId", "tags": "ExcerptPostId"}
ALIAS = {"users": "u", "posts": "p", "comments": "c", "votes": "v",
         "badges": "b", "postHistory": "ph", "postLinks": "pl", "tags": "t"}


def _ts_literal(rng: random.Random) -> str:
    y = rng.randint(2010, 2014)
    mo, d = rng.randint(1, 12), rng.randint(1, 28)
    h, mi, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
    return f"'{y}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}'::timestamp"


def generate(n: int = 146, seed: int = 7) -> dict[str, str]:
    rng = random.Random(seed)
    sats_u = sorted(TO_USERS)
    sats_p = sorted(TO_POSTS)
    out: dict[str, str] = {}
    for i in range(1, n + 1):
        shape = rng.choice(["u", "p", "up", "pp", "uu", "full"])
        tables: list[str] = []
        joins: list[str] = []
        if shape == "u":  # users + 1-3 user satellites
            tables.append("users")
            for s in rng.sample(sats_u, rng.randint(1, 3)):
                tables.append(s)
                joins.append(f"{ALIAS[s]}.{TO_USERS[s]} = u.Id")
        elif shape == "p":  # posts + 1-3 post satellites
            tables.append("posts")
            for s in rng.sample(sats_p, rng.randint(1, 3)):
                tables.append(s)
                joins.append(f"{ALIAS[s]}.{TO_POSTS[s]} = p.Id")
        elif shape == "up":  # users-posts star
            tables += ["users", "posts"]
            joins.append("p.OwnerUserId = u.Id")
            for s in rng.sample(sats_p, rng.randint(0, 2)):
                tables.append(s)
                joins.append(f"{ALIAS[s]}.{TO_POSTS[s]} = p.Id")
        elif shape == "pp":  # posts + postLinks (+ comments)
            tables += ["posts", "postLinks"]
            joins.append("pl.PostId = p.Id")
            if rng.random() < 0.5:
                tables.append("comments")
                joins.append("c.PostId = p.Id")
        elif shape == "uu":  # user-centric pair of satellites
            tables += ["users", "badges", "comments"]
            joins.append("b.UserId = u.Id")
            joins.append("c.UserId = u.Id")
        else:  # the wide 5-7 table shape of the hardest Stats-CEB queries
            tables += ["users", "posts"]
            joins.append("p.OwnerUserId = u.Id")
            for s in rng.sample(sats_p, rng.randint(2, 3)):
                tables.append(s)
                joins.append(f"{ALIAS[s]}.{TO_POSTS[s]} = p.Id")
            for s in rng.sample(["badges"], 1):
                if s not in tables:
                    tables.append(s)
                    joins.append(f"{ALIAS[s]}.{TO_USERS[s]} = u.Id")
        preds: list[str] = []
        for tbl in tables:
            a = ALIAS[tbl]
            for col, lo, hi in NUM[tbl]:
                r = rng.random()
                if r < 0.25:
                    preds.append(f"{a}.{col}>={rng.randint(lo, (lo + hi) // 2)}")
                elif r < 0.45:
                    preds.append(f"{a}.{col}<={rng.randint((lo + hi) // 2, hi)}")
                elif r < 0.52:
                    preds.append(f"{a}.{col}={rng.randint(lo, hi)}")
            ts = TS[tbl]
            if ts and rng.random() < 0.35:
                op = rng.choice([">=", "<="])
                preds.append(f"{a}.{ts}{op}{_ts_literal(rng)}")
        froms = ", ".join(f"{t} as {ALIAS[t]}" for t in tables)
        where = " AND ".join(joins + preds) if (joins or preds) else "1=1"
        out[f"q{i:03d}"] = f"SELECT COUNT(*) FROM {froms} WHERE {where};"
    return out


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    queries = generate()
    for label, sql in queries.items():
        with open(os.path.join(OUT, f"{label}.sql"), "w") as fh:
            fh.write(sql + "\n")
    print(f"wrote {len(queries)} queries to {OUT}")


if __name__ == "__main__":
    main()
