"""Deterministic downscaled StackExchange dataset (the Stack benchmark).

The Stack benchmark (Marcus et al., "Bao: Making Learned Query
Optimization Practical", SIGMOD 2021) runs over a multi-site
StackExchange dump with the 10-table schema below; the reference fetches
its query corpus from the same public archive this repo's
``workloads.stack`` loader targets (ref ``postbound/workloads.py:46-53``).
This module generates the SCHEMA at a few thousand rows so the committed
fixture corpus (``workloads/fixtures/stack``) can EXECUTE against both
Spark and the DuckDB oracle offline, not just parse.

Shapes mirror the real dump: snake_case tables keyed by ``id`` +
``site_id`` composites, questions/answers linked through
``question_id``/``accepted_answer_id``, tags m:n through
``tag_question``, users keyed per-site with a cross-site ``account``,
and microsecond-precision timestamps (nanosecond parquet would trip
Spark's TIMESTAMP(NANOS) handling — the events.parquet lesson).

Value ranges line up with the fixture queries' literals (site names,
tag names, score/view/reputation bounds, 2010-2014 dates) so the corpus
is not vacuous on this data.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

STACK_TABLES = [
    "account", "answer", "badge", "comment", "post_link", "question",
    "site", "so_user", "tag", "tag_question",
]

SITE_NAMES = ["stackoverflow", "math", "superuser", "serverfault", "askubuntu"]
TAG_NAMES = [
    "python", "javascript", "java", "c++", "sql", "linux", "git",
    "performance", "algorithm", "testing", "networking", "security",
    "calculus", "probability", "bash", "windows",
]
BADGE_NAMES = ["Teacher", "Student", "Editor", "Supporter", "Critic", "Scholar"]


def _timestamps(rng: np.random.RandomState, n: int) -> pd.Series:
    base = pd.Timestamp("2010-01-01").value // 1000  # micros
    span = (
        pd.Timestamp("2014-12-31").value - pd.Timestamp("2010-01-01").value
    ) // 1000
    micros = base + rng.randint(0, span, n)
    return pd.Series(micros.astype("datetime64[us]"))


def generate_stack_fixture(
    out_dir: str,
    seed: int = 11,
    n_accounts: int = 600,
    n_questions: int = 2500,
) -> dict[str, pd.DataFrame]:
    """Write the 10 Stack tables as parquet under ``out_dir``;
    deterministic in ``seed`` so Spark and DuckDB read identical files."""
    rng = np.random.RandomState(seed)
    n_sites = len(SITE_NAMES)

    tables: dict[str, pd.DataFrame] = {}
    tables["site"] = pd.DataFrame(
        {"site_id": np.arange(1, n_sites + 1), "site_name": SITE_NAMES}
    )
    tables["account"] = pd.DataFrame(
        {
            "id": np.arange(1, n_accounts + 1),
            "display_name": [f"user_{i:04d}" for i in range(1, n_accounts + 1)],
            "location": rng.choice(
                ["", "USA", "Germany", "India", "UK", "France"], n_accounts
            ),
            "website_url": [
                f"https://example.org/u{i}" if i % 7 == 0 else ""
                for i in range(1, n_accounts + 1)
            ],
        }
    )
    # each account has users on 1-3 sites; so_user ids are global
    user_rows = []
    uid = 1
    for acct in range(1, n_accounts + 1):
        for site in rng.choice(
            np.arange(1, n_sites + 1), rng.randint(1, 4), replace=False
        ):
            user_rows.append(
                (
                    uid,
                    int(site),
                    int(acct),
                    int(min(int(rng.pareto(1.4) * 120) + 1, 50_000)),
                )
            )
            uid += 1
    users = pd.DataFrame(
        user_rows, columns=["id", "site_id", "account_id", "reputation"]
    )
    users["creation_date"] = _timestamps(rng, len(users))
    tables["so_user"] = users
    n_users = len(users)

    def site_users(site_ids: np.ndarray) -> np.ndarray:
        """A user id valid for each row's site (power-law activity)."""
        by_site = {
            s: users[users.site_id == s].id.to_numpy()
            for s in range(1, n_sites + 1)
        }
        picks = np.empty(len(site_ids), dtype=np.int64)
        for i, s in enumerate(site_ids):
            pool = by_site[int(s)]
            u = rng.random_sample()
            picks[i] = pool[min(int(u**1.6 * len(pool)), len(pool) - 1)]
        return picks

    q_sites = rng.choice(
        np.arange(1, n_sites + 1), n_questions, p=[0.5, 0.2, 0.12, 0.1, 0.08]
    )
    tables["question"] = pd.DataFrame(
        {
            "id": np.arange(1, n_questions + 1),
            "site_id": q_sites,
            "owner_user_id": site_users(q_sites),
            "creation_date": _timestamps(rng, n_questions),
            "score": rng.randint(-3, 80, n_questions),
            "view_count": rng.randint(0, 20_001, n_questions),
            "favorite_count": rng.randint(0, 31, n_questions),
            "title": [f"question {i}" for i in range(1, n_questions + 1)],
        }
    )
    n_answers = int(n_questions * 1.8)
    a_q = rng.randint(1, n_questions + 1, n_answers)
    a_sites = q_sites[a_q - 1]
    tables["answer"] = pd.DataFrame(
        {
            "id": np.arange(1, n_answers + 1),
            "site_id": a_sites,
            "question_id": a_q,
            "owner_user_id": site_users(a_sites),
            "creation_date": _timestamps(rng, n_answers),
            "score": rng.randint(-2, 60, n_answers),
        }
    )
    # accepted answers: ~60% of questions accept one of their answers
    accepted = pd.Series(pd.NA, index=range(n_questions), dtype="Int64")
    by_q = tables["answer"].groupby("question_id").id.first()
    take = rng.random_sample(n_questions) < 0.6
    for qid, aid in by_q.items():
        if take[qid - 1]:
            accepted.iloc[qid - 1] = aid
    tables["question"]["accepted_answer_id"] = accepted

    n_tags_total = n_sites * len(TAG_NAMES)
    tables["tag"] = pd.DataFrame(
        {
            "id": np.arange(1, n_tags_total + 1),
            "site_id": np.repeat(np.arange(1, n_sites + 1), len(TAG_NAMES)),
            "name": TAG_NAMES * n_sites,
        }
    )
    n_tq = n_questions * 2
    tq_q = rng.randint(1, n_questions + 1, n_tq)
    tq_sites = q_sites[tq_q - 1]
    tq_tag = (tq_sites - 1) * len(TAG_NAMES) + rng.randint(
        1, len(TAG_NAMES) + 1, n_tq
    )
    tables["tag_question"] = pd.DataFrame(
        {"question_id": tq_q, "tag_id": tq_tag, "site_id": tq_sites}
    ).drop_duplicates()

    n_badges = n_users * 2
    b_users = users.id.to_numpy()[rng.randint(0, n_users, n_badges)]
    b_sites = users.set_index("id").site_id.loc[b_users].to_numpy()
    tables["badge"] = pd.DataFrame(
        {
            "site_id": b_sites,
            "user_id": b_users,
            "name": rng.choice(BADGE_NAMES, n_badges),
            "date": _timestamps(rng, n_badges),
        }
    )
    n_comments = n_questions * 2
    c_q = rng.randint(1, n_questions + 1, n_comments)
    c_sites = q_sites[c_q - 1]
    tables["comment"] = pd.DataFrame(
        {
            "id": np.arange(1, n_comments + 1),
            "site_id": c_sites,
            "post_id": c_q,
            "user_id": site_users(c_sites),
            "score": rng.randint(0, 15, n_comments),
            "date": _timestamps(rng, n_comments),
        }
    )
    n_links = n_questions // 3
    tables["post_link"] = pd.DataFrame(
        {
            "site_id": q_sites[: n_links],
            "post_id_from": np.arange(1, n_links + 1),
            "post_id_to": rng.randint(1, n_questions + 1, n_links),
            "link_type_id": rng.choice([1, 3], n_links, p=[0.8, 0.2]),
            "date": _timestamps(rng, n_links),
        }
    )

    os.makedirs(out_dir, exist_ok=True)
    for name, frame in tables.items():
        frame.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    return tables
