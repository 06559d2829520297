"""Deterministic downscaled IMDB-shaped dataset for the JOB corpus.

The Join Order Benchmark runs over the 21-table IMDB schema (Leis et
al., PVLDB 9(3), 2015; the reference's setup scripts build the full
~3.6 GB database — ref ``db-support/postgres/workload-job-setup.sh``).
The test suite needs the same SCHEMA at a few thousand rows so every
fixture query can execute against both Spark and the DuckDB oracle in
seconds: this module generates that dataset — seeded, so both engines
read byte-identical parquet.

Value distributions are shaped so the JOB fixture's selective literals
actually select something: the exact ``info_type``/``kind_type``/
``link_type``/``comp_cast_type`` vocabularies, company names containing
``Film``/``Warner``/``Lionsgate``, IMDB-format person names
(``Downey Jr., Robert``), release-date strings matching
``USA:% 200%``, note fragments like ``(co-production)`` /
``(voice) (uncredited)``, and the named titles (``Shrek 2``) the
queries pin. Null fractions mirror the real columns that JOB predicates
test with ``IS NULL`` / ``IS NOT NULL`` (``mc.note``, ``n.gender``,
``t.episode_nr``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

INFO_TYPES = [
    "top 250 rank", "bottom 10 rank", "genres", "rating", "release dates",
    "countries", "budget", "votes", "mini biography", "trivia",
    "color info", "languages",
]
KIND_TYPES = [
    "movie", "tv series", "tv movie", "video movie", "tv mini series",
    "video game", "episode",
]
COMPANY_TYPES = [
    "production companies", "distributors", "special effects companies",
    "miscellaneous companies",
]
COMP_CAST_TYPES = ["cast", "crew", "complete", "complete+verified"]
LINK_TYPES = [
    "sequel", "follows", "followed by", "remake of", "remade as",
    "features", "featured in", "spin off from", "spin off", "version of",
]
ROLE_TYPES = [
    "actor", "actress", "producer", "writer", "cinematographer", "composer",
    "costume designer", "director", "editor", "guest",
]
KEYWORDS = [
    "character-name-in-title", "sequel", "superhero",
    "marvel-cinematic-universe", "marvel-comics", "based-on-comic",
    "tv-special", "fight", "violence", "murder", "murder-in-title", "blood",
    "gore", "death", "female-nudity", "hospital", "martial-arts",
    "hand-to-hand-combat", "hero", "computer-animation", "second-part",
    "magnet", "web", "claw", "laser", "10,000-mile-club", "nerd", "loner",
    "alienation", "dignity", "based-on-novel", "love", "friendship",
    "revenge", "dystopia", "time-travel", "robot", "alien-invasion",
]
GENRES = ["Drama", "Horror", "Thriller", "Comedy", "Action", "Documentary"]
COUNTRIES = [
    "Sweden", "Norway", "Germany", "Denmark", "Swedish", "Denish",
    "Norwegian", "German", "USA", "American", "Bulgaria", "France", "Japan",
    "America",
]
COUNTRY_CODES = [
    "[us]", "[de]", "[jp]", "[ru]", "[nl]", "[fr]", "[gb]", "[pl]", "[sm]",
    "[it]",
]
SURNAMES = [
    "Anderson", "Baker", "Bergman", "Carter", "Downey Jr.", "Evans",
    "Fischer", "Garcia", "Hansen", "Ito", "Jolie", "Kim", "Larsson",
    "Moore", "Nilsson", "O'Brien", "Park", "Quinn", "Rossi", "Smith",
    "Tanaka", "Underwood", "Vogel", "Weber", "Xu", "Yoshida", "Zhang",
    "Bertelli",
]
FIRSTS = [
    "Alice", "Angela", "Angelina", "Anne", "Bert", "Bob", "Carol", "David",
    "Erik", "Frank", "Greta", "Hiro", "Ingrid", "James", "Karin", "Liam",
    "Maria", "Niels", "Olga", "Pierre", "Robert", "Sara", "Timothy", "Ulla",
    "Victor", "Wendy", "Xenia", "Yoko", "Yolanda", "Zara",
]
TITLE_WORDS = [
    "Champion", "Loser", "Money", "Murder", "Movie", "Night", "Dream",
    "River", "Shadow", "Storm", "Empire", "Garden", "Island", "Journey",
    "Kingdom", "Legend", "Mirror", "Ocean", "Palace", "Quest", "Return",
    "Secret", "Tower", "Voyage", "Winter", "Mord",
]
NAMED_TITLES = [
    ("Shrek 2", 2004), ("Kung Fu Panda", 2008), ("Vampire Diary", 2011),
    ("One Piece", 2006), ("Dragon Ball Z", 2007), ("Birdemic", 2010),
    ("Iron Man", 2008), ("Iron Man 2", 2010), ("The Avengers", 2012),
    ("Sherlock Holmes", 2009),
]
CHAR_NAMES = [
    "Tony Stark", "Iron Man", "Queen", "Spider-Man", "Superman", "Batman",
    "Sherlock Holmes", "The Man", "Wonder Woman", "Old Man", "Aquaman",
    "King", "Doctor", "Nurse", "Teacher", "Pilot", "Captain", "Sailor man",
]
MC_NOTE_PARTS = [
    "(co-production)", "(presents)", "(as Metro-Goldwyn-Mayer Pictures)",
    "(USA)", "(worldwide)", "(Japan)", "(theatrical)", "(France)", "(VHS)",
    "(1994)", "(TV)", "(video)",
]
CI_NOTES = [
    "(voice)", "(voice: English version)", "(voice: Japanese version)",
    "(voice) (uncredited)", "(producer)", "(executive producer)",
    "(writer)", "(head writer)", "(written by)", "(story)", "(story editor)",
    "(uncredited)", "(archive footage)",
]


def generate_imdb_fixture(
    out_dir: str,
    seed: int = 42,
    n_titles: int = 1500,
    n_names: int = 600,
) -> dict[str, pd.DataFrame]:
    """Write the 21 IMDB tables as parquet under ``out_dir`` and return
    the frames. Deterministic in ``seed`` — Spark and DuckDB read the
    same files, so any result difference is an engine bug, never data."""
    rng = np.random.RandomState(seed)

    def opt_int(values: np.ndarray, null_frac: float) -> pd.Series:
        s = pd.Series(values, dtype="Int64")
        s[rng.random_sample(len(s)) < null_frac] = pd.NA
        return s

    def opt_str(values: list, null_frac: float) -> list:
        return [
            None if rng.random_sample() < null_frac else v for v in values
        ]

    def simple(names: list[str], col: str) -> pd.DataFrame:
        return pd.DataFrame({"id": np.arange(1, len(names) + 1), col: names})

    tables: dict[str, pd.DataFrame] = {}
    tables["info_type"] = simple(INFO_TYPES, "info")
    tables["kind_type"] = simple(KIND_TYPES, "kind")
    tables["company_type"] = simple(COMPANY_TYPES, "kind")
    tables["comp_cast_type"] = simple(COMP_CAST_TYPES, "kind")
    tables["link_type"] = simple(LINK_TYPES, "link")
    tables["role_type"] = simple(ROLE_TYPES, "role")
    tables["keyword"] = pd.DataFrame(
        {
            "id": np.arange(1, len(KEYWORDS) + 1),
            "keyword": KEYWORDS,
            "phonetic_code": [k[:4].upper() for k in KEYWORDS],
        }
    )
    it_id = {info: i + 1 for i, info in enumerate(INFO_TYPES)}

    n_companies = 200
    company_names = []
    for i in range(n_companies):
        r = rng.random_sample()
        if r < 0.05:
            company_names.append("Warner Bros. Pictures")
        elif r < 0.08:
            company_names.append("Lionsgate Films")
        elif r < 0.10:
            company_names.append("YouTube")
        elif r < 0.35:
            company_names.append(
                f"{rng.choice(TITLE_WORDS)} Film {rng.choice(['AB', 'GmbH', 'Inc.', 'Ltd.'])}"
            )
        else:
            company_names.append(
                f"{rng.choice(TITLE_WORDS)} {rng.choice(['Studios', 'Entertainment', 'Media', 'Productions'])}"
            )
    tables["company_name"] = pd.DataFrame(
        {
            "id": np.arange(1, n_companies + 1),
            "name": company_names,
            "country_code": opt_str(
                list(rng.choice(COUNTRY_CODES, n_companies)), 0.05
            ),
            "imdb_id": opt_int(rng.randint(1, 10**6, n_companies), 0.9),
            "name_pcode_nf": [c[:4].upper() for c in company_names],
            "name_pcode_sf": [c[:3].upper() for c in company_names],
            "md5sum": [f"{i:032x}" for i in range(n_companies)],
        }
    )

    person_names = [
        f"{rng.choice(SURNAMES)}, {rng.choice(FIRSTS)}" for _ in range(n_names)
    ]
    tables["name"] = pd.DataFrame(
        {
            "id": np.arange(1, n_names + 1),
            "name": person_names,
            "imdb_index": opt_str(["I"] * n_names, 0.95),
            "imdb_id": opt_int(rng.randint(1, 10**6, n_names), 0.9),
            "gender": opt_str(list(rng.choice(["m", "f"], n_names)), 0.1),
            "name_pcode_cf": [
                f"{n[0]}{rng.randint(100, 700)}" for n in person_names
            ],
            "name_pcode_nf": [n[:4].upper() for n in person_names],
            "surname_pcode": [n.split(",")[0][:3].upper() for n in person_names],
            "md5sum": [f"{i:032x}" for i in range(n_names)],
        }
    )

    n_chars = 300
    char_names = [
        CHAR_NAMES[i % len(CHAR_NAMES)]
        if i < 60
        else f"{rng.choice(FIRSTS)} the {rng.choice(TITLE_WORDS)}"
        for i in range(n_chars)
    ]
    tables["char_name"] = pd.DataFrame(
        {
            "id": np.arange(1, n_chars + 1),
            "name": char_names,
            "imdb_index": opt_str(["I"] * n_chars, 0.95),
            "imdb_id": opt_int(rng.randint(1, 10**6, n_chars), 0.9),
            "name_pcode_nf": [c[:4].upper() for c in char_names],
            "surname_pcode": [c[:3].upper() for c in char_names],
            "md5sum": [f"{i:032x}" for i in range(n_chars)],
        }
    )

    titles = [
        f"The {rng.choice(TITLE_WORDS)} of the {rng.choice(TITLE_WORDS)}"
        for _ in range(n_titles)
    ]
    years = rng.randint(1940, 2016, n_titles)
    for i, (named, year) in enumerate(NAMED_TITLES):
        titles[i], years[i] = named, year
    tables["title"] = pd.DataFrame(
        {
            "id": np.arange(1, n_titles + 1),
            "title": titles,
            "imdb_index": opt_str(["I"] * n_titles, 0.95),
            "kind_id": rng.choice(
                np.arange(1, len(KIND_TYPES) + 1),
                n_titles,
                p=[0.55, 0.1, 0.05, 0.05, 0.03, 0.02, 0.2],
            ),
            "production_year": opt_int(years, 0.02),
            "imdb_id": opt_int(rng.randint(1, 10**7, n_titles), 0.9),
            "phonetic_code": [t[:4].upper() for t in titles],
            "episode_of_id": opt_int(rng.randint(1, n_titles, n_titles), 0.85),
            "season_nr": opt_int(rng.randint(1, 12, n_titles), 0.8),
            "episode_nr": opt_int(rng.randint(1, 200, n_titles), 0.7),
            "series_years": opt_str(["2000-2010"] * n_titles, 0.9),
            "md5sum": [f"{i:032x}" for i in range(n_titles)],
        }
    )

    def movie_ids(n: int) -> np.ndarray:
        # mildly skewed (u^1.5 power law): popular titles accrue a few times
        # more satellite rows than the tail — like IMDB — without any single
        # hot key dominating joins (a zipf here made movie 1 carry ~30% of
        # every satellite table, exploding multi-satellite join fixtures)
        u = rng.random_sample(n)
        return np.minimum((u**1.5 * n_titles).astype(int) + 1, n_titles)

    n_mc = 4000
    mc_notes = []
    for _ in range(n_mc):
        parts = list(
            rng.choice(MC_NOTE_PARTS, rng.randint(1, 4), replace=False)
        )
        if rng.random_sample() < 0.4:
            parts.insert(0, f"({rng.randint(1990, 2016)})")
        mc_notes.append(" ".join(parts))
    tables["movie_companies"] = pd.DataFrame(
        {
            "id": np.arange(1, n_mc + 1),
            "movie_id": movie_ids(n_mc),
            "company_id": rng.randint(1, n_companies + 1, n_mc),
            "company_type_id": rng.choice(
                np.arange(1, 5), n_mc, p=[0.5, 0.35, 0.1, 0.05]
            ),
            "note": opt_str(mc_notes, 0.3),
        }
    )

    n_mi = 8000
    mi_types = rng.choice(
        [it_id["genres"], it_id["countries"], it_id["release dates"],
         it_id["budget"], it_id["color info"], it_id["languages"]],
        n_mi,
        p=[0.2, 0.25, 0.3, 0.1, 0.1, 0.05],
    )
    months = ["January", "March", "June", "September", "December"]
    mi_infos, mi_notes = [], []
    for ty in mi_types:
        if ty == it_id["genres"]:
            mi_infos.append(str(rng.choice(GENRES)))
        elif ty == it_id["countries"]:
            mi_infos.append(str(rng.choice(COUNTRIES)))
        elif ty == it_id["release dates"]:
            country = rng.choice(["USA", "Japan", "Germany", "France"])
            mi_infos.append(
                f"{country}: {rng.randint(1, 29)} {rng.choice(months)} "
                f"{rng.randint(1985, 2016)}"
            )
        elif ty == it_id["budget"]:
            mi_infos.append(f"${rng.randint(1, 200)},000,000")
        else:
            mi_infos.append(str(rng.choice(["Color", "Black and White", "English"])))
        mi_notes.append(
            str(rng.choice(["(internet release)", "(premiere)", "(DVD)", "(TV)"]))
        )
    tables["movie_info"] = pd.DataFrame(
        {
            "id": np.arange(1, n_mi + 1),
            "movie_id": movie_ids(n_mi),
            "info_type_id": mi_types,
            "info": mi_infos,
            "note": opt_str(mi_notes, 0.6),
        }
    )

    n_mix = 3000
    mix_types = rng.choice(
        [it_id["rating"], it_id["votes"], it_id["top 250 rank"],
         it_id["bottom 10 rank"]],
        n_mix,
        p=[0.45, 0.45, 0.05, 0.05],
    )
    mix_infos = []
    for ty in mix_types:
        if ty == it_id["rating"]:
            mix_infos.append(f"{rng.randint(10, 100) / 10.0:.1f}")
        elif ty == it_id["votes"]:
            mix_infos.append(str(rng.randint(5, 200000)))
        elif ty == it_id["top 250 rank"]:
            mix_infos.append(str(rng.randint(1, 251)))
        else:
            mix_infos.append(str(rng.randint(1, 11)))
    tables["movie_info_idx"] = pd.DataFrame(
        {
            "id": np.arange(1, n_mix + 1),
            "movie_id": movie_ids(n_mix),
            "info_type_id": mix_types,
            "info": mix_infos,
            "note": opt_str([""] * n_mix, 0.99),
        }
    )

    n_mk = 5000
    tables["movie_keyword"] = pd.DataFrame(
        {
            "id": np.arange(1, n_mk + 1),
            "movie_id": movie_ids(n_mk),
            "keyword_id": rng.choice(
                np.arange(1, len(KEYWORDS) + 1),
                n_mk,
                p=np.array([3.0] * 26 + [1.0] * (len(KEYWORDS) - 26))
                / (3.0 * 26 + (len(KEYWORDS) - 26)),
            ),
        }
    )

    n_ci = 9000
    tables["cast_info"] = pd.DataFrame(
        {
            "id": np.arange(1, n_ci + 1),
            "person_id": rng.randint(1, n_names + 1, n_ci),
            "movie_id": movie_ids(n_ci),
            "person_role_id": opt_int(rng.randint(1, n_chars + 1, n_ci), 0.4),
            "note": opt_str(list(rng.choice(CI_NOTES, n_ci)), 0.5),
            "nr_order": opt_int(rng.randint(1, 50, n_ci), 0.5),
            "role_id": rng.randint(1, len(ROLE_TYPES) + 1, n_ci),
        }
    )

    n_an = 500
    an_people = rng.randint(1, n_names + 1, n_an)
    tables["aka_name"] = pd.DataFrame(
        {
            "id": np.arange(1, n_an + 1),
            "person_id": an_people,
            "name": [
                f"{rng.choice(FIRSTS)} {rng.choice(SURNAMES)}"
                for _ in range(n_an)
            ],
            "imdb_index": opt_str(["I"] * n_an, 0.95),
            "name_pcode_cf": [f"A{rng.randint(100, 700)}" for _ in range(n_an)],
            "name_pcode_nf": [f"B{rng.randint(100, 700)}" for _ in range(n_an)],
            "surname_pcode": [f"C{rng.randint(10, 70)}" for _ in range(n_an)],
            "md5sum": [f"{i:032x}" for i in range(n_an)],
        }
    )

    n_at = 300
    tables["aka_title"] = pd.DataFrame(
        {
            "id": np.arange(1, n_at + 1),
            "movie_id": movie_ids(n_at),
            "title": [
                f"AKA {rng.choice(TITLE_WORDS)} {rng.choice(TITLE_WORDS)}"
                for _ in range(n_at)
            ],
            "imdb_index": opt_str(["I"] * n_at, 0.95),
            "kind_id": rng.randint(1, len(KIND_TYPES) + 1, n_at),
            "production_year": opt_int(rng.randint(1940, 2016, n_at), 0.1),
            "phonetic_code": [f"P{rng.randint(100, 700)}" for _ in range(n_at)],
            "episode_of_id": opt_int(rng.randint(1, n_titles, n_at), 0.9),
            "season_nr": opt_int(rng.randint(1, 12, n_at), 0.9),
            "episode_nr": opt_int(rng.randint(1, 200, n_at), 0.9),
            "note": opt_str(["(alternative)"] * n_at, 0.8),
            "md5sum": [f"{i:032x}" for i in range(n_at)],
        }
    )

    n_cc = 600
    tables["complete_cast"] = pd.DataFrame(
        {
            "id": np.arange(1, n_cc + 1),
            "movie_id": movie_ids(n_cc),
            "subject_id": rng.randint(1, 3, n_cc),  # cast / crew
            "status_id": rng.randint(3, 5, n_cc),  # complete / complete+verified
        }
    )

    n_ml = 300
    tables["movie_link"] = pd.DataFrame(
        {
            "id": np.arange(1, n_ml + 1),
            "movie_id": movie_ids(n_ml),
            "linked_movie_id": movie_ids(n_ml),
            "link_type_id": rng.randint(1, len(LINK_TYPES) + 1, n_ml),
        }
    )

    n_pi = 800
    tables["person_info"] = pd.DataFrame(
        {
            "id": np.arange(1, n_pi + 1),
            "person_id": rng.randint(1, n_names + 1, n_pi),
            "info_type_id": rng.choice(
                [it_id["mini biography"], it_id["trivia"]], n_pi
            ),
            "info": [
                f"Born in {rng.randint(1930, 2000)}; notable person."
                for _ in range(n_pi)
            ],
            "note": opt_str(
                list(
                    rng.choice(
                        ["Volker Boehm", "Anonymous", "IMDb editors"],
                        n_pi,
                        p=[0.3, 0.4, 0.3],
                    )
                ),
                0.4,
            ),
        }
    )

    os.makedirs(out_dir, exist_ok=True)
    for name, frame in tables.items():
        frame.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    return tables


IMDB_TABLES = [
    "aka_name", "aka_title", "cast_info", "char_name", "comp_cast_type",
    "company_name", "company_type", "complete_cast", "info_type", "keyword",
    "kind_type", "link_type", "movie_companies", "movie_info",
    "movie_info_idx", "movie_keyword", "movie_link", "name", "person_info",
    "role_type", "title",
]
