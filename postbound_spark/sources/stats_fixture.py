"""Deterministic downscaled Stack-Exchange-stats dataset (Stats-CEB).

The Stats-CEB benchmark (Han et al., PVLDB 15(4), 2021) runs over the
8-table stats.stackexchange.com schema; the reference's setup script
builds the full database (ref ``db-support/postgres/workload-stats-
setup.sh``). This module generates the same SCHEMA at a few thousand
rows so the committed fixture corpus (``workloads/fixtures/stats``) can
EXECUTE against both Spark and the DuckDB oracle, not just parse.

Shapes mirror the real tables: CamelCase column names, foreign keys
through ``Id``/``PostId``/``UserId``/``OwnerUserId``/``RelatedPostId``/
``ExcerptPostId``, value ranges matching the corpus generator's
predicate ranges (``scripts/gen_stats_fixture.py``), and
microsecond-precision timestamps (nanosecond parquet would trip Spark's
TIMESTAMP(NANOS) handling — the events.parquet lesson).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

STATS_TABLES = [
    "badges", "comments", "postHistory", "postLinks", "posts", "tags",
    "users", "votes",
]


def _timestamps(rng: np.random.RandomState, n: int) -> pd.Series:
    """Random 2010-2014 timestamps at microsecond precision."""
    base = pd.Timestamp("2010-01-01").value // 1000  # micros
    span = (pd.Timestamp("2014-12-31").value - pd.Timestamp("2010-01-01").value) // 1000
    micros = base + rng.randint(0, span, n)
    return pd.Series(micros.astype("datetime64[us]"))


def generate_stats_fixture(
    out_dir: str,
    seed: int = 7,
    n_users: int = 1000,
    n_posts: int = 3000,
) -> dict[str, pd.DataFrame]:
    """Write the 8 stats tables as parquet under ``out_dir``; deterministic
    in ``seed`` so Spark and DuckDB read byte-identical files."""
    rng = np.random.RandomState(seed)

    def opt_int(values: np.ndarray, null_frac: float) -> pd.Series:
        s = pd.Series(values, dtype="Int64")
        s[rng.random_sample(len(s)) < null_frac] = pd.NA
        return s

    def user_ids(n: int) -> np.ndarray:
        u = rng.random_sample(n)  # mild power-law: active users dominate
        return np.minimum((u**1.5 * n_users).astype(int) + 1, n_users)

    def post_ids(n: int) -> np.ndarray:
        u = rng.random_sample(n)
        return np.minimum((u**1.5 * n_posts).astype(int) + 1, n_posts)

    tables: dict[str, pd.DataFrame] = {}
    tables["users"] = pd.DataFrame(
        {
            "Id": np.arange(1, n_users + 1),
            "Reputation": np.minimum(
                (rng.pareto(1.5, n_users) * 50 + 1).astype(int), 1000
            ),
            "CreationDate": _timestamps(rng, n_users),
            "Views": rng.randint(0, 501, n_users),
            "UpVotes": rng.randint(0, 501, n_users),
            "DownVotes": rng.randint(0, 51, n_users),
        }
    )
    tables["posts"] = pd.DataFrame(
        {
            "Id": np.arange(1, n_posts + 1),
            "PostTypeId": rng.choice(
                np.arange(1, 8), n_posts, p=[0.4, 0.45, 0.05, 0.04, 0.03, 0.02, 0.01]
            ),
            "CreationDate": _timestamps(rng, n_posts),
            "Score": rng.randint(-5, 101, n_posts),
            "ViewCount": rng.randint(0, 8001, n_posts),
            "OwnerUserId": opt_int(user_ids(n_posts), 0.05),
            "AnswerCount": rng.randint(0, 11, n_posts),
            "CommentCount": rng.randint(0, 21, n_posts),
            "FavoriteCount": rng.randint(0, 51, n_posts),
        }
    )
    n_comments = 5000
    tables["comments"] = pd.DataFrame(
        {
            "Id": np.arange(1, n_comments + 1),
            "PostId": post_ids(n_comments),
            "Score": rng.randint(0, 21, n_comments),
            "CreationDate": _timestamps(rng, n_comments),
            "UserId": opt_int(user_ids(n_comments), 0.1),
        }
    )
    n_votes = 6000
    tables["votes"] = pd.DataFrame(
        {
            "Id": np.arange(1, n_votes + 1),
            "PostId": post_ids(n_votes),
            "VoteTypeId": rng.choice(
                np.arange(1, 16),
                n_votes,
                p=np.array([1, 8, 2, 1, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1], dtype=float)
                / 25.0,
            ),
            "CreationDate": _timestamps(rng, n_votes),
            "UserId": opt_int(user_ids(n_votes), 0.4),
            "BountyAmount": opt_int(rng.randint(0, 501, n_votes), 0.9),
        }
    )
    n_badges = 2000
    tables["badges"] = pd.DataFrame(
        {
            "Id": np.arange(1, n_badges + 1),
            "UserId": user_ids(n_badges),
            "Date": _timestamps(rng, n_badges),
        }
    )
    n_hist = 4000
    tables["postHistory"] = pd.DataFrame(
        {
            "Id": np.arange(1, n_hist + 1),
            "PostHistoryTypeId": rng.randint(1, 21, n_hist),
            "PostId": post_ids(n_hist),
            "CreationDate": _timestamps(rng, n_hist),
            "UserId": opt_int(user_ids(n_hist), 0.15),
        }
    )
    n_links = 600
    tables["postLinks"] = pd.DataFrame(
        {
            "Id": np.arange(1, n_links + 1),
            "CreationDate": _timestamps(rng, n_links),
            "PostId": post_ids(n_links),
            "RelatedPostId": post_ids(n_links),
            "LinkTypeId": rng.choice(np.arange(1, 4), n_links, p=[0.8, 0.15, 0.05]),
        }
    )
    n_tags = 300
    tables["tags"] = pd.DataFrame(
        {
            "Id": np.arange(1, n_tags + 1),
            "Count": np.minimum((rng.pareto(1.2, n_tags) * 30 + 1).astype(int), 1000),
            "ExcerptPostId": opt_int(post_ids(n_tags), 0.3),
        }
    )

    os.makedirs(out_dir, exist_ok=True)
    for name, frame in tables.items():
        frame.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    return tables
