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

#: bump when the generated DATA changes (experiment fixture caches embed
#: this in their done-markers so a stale cache regenerates, never serves)
FIXTURE_VERSION = 3

INFO_TYPES = [
    "top 250 rank", "bottom 10 rank", "genres", "rating", "release dates",
    "countries", "budget", "votes", "mini biography", "trivia",
    "color info", "languages",
    "height",  # appended (ids above are load-bearing): JOB 29b pins it
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

    _seed_job_witnesses(tables, it_id)

    os.makedirs(out_dir, exist_ok=True)
    for name, frame in tables.items():
        frame.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    return tables


def _seed_job_witnesses(tables: dict[str, pd.DataFrame], it_id: dict[str, int]) -> None:
    """Append WITNESS bundles so every JOB fixture query's predicate
    conjunction matches at least one row (fixture v2, round-7 audit:
    42/113 queries matched nothing because random data rarely satisfies
    a 6-table conjunction like keyword='marvel-cinematic-universe' AND
    name LIKE '%%Downey%%Robert%%' AND year>2014 simultaneously).

    Each witness is a handcrafted movie bundle — title + the satellite
    rows one query family pins — constructed directly from the fixture
    corpus's literals (``workloads/fixtures/job``), so the corpus stops
    being vacuous: an optimizer that silently drops a join or misbinds a
    self-join alias now changes real aggregate VALUES, not just NULL
    rows. Appending (never mutating) keeps every previously-matching
    query matching; ids continue from each table's max."""

    counters = {name: int(frame["id"].max()) for name, frame in tables.items()}
    added: dict[str, list[dict]] = {name: [] for name in tables}

    def add(table: str, **cols) -> int:
        counters[table] += 1
        added[table].append({"id": counters[table], **cols})
        return counters[table]

    def dim_id(table: str, col: str, value: str) -> int:
        frame = tables[table]
        hit = frame.loc[frame[col] == value, "id"]
        if not len(hit):
            raise ValueError(f"fixture dim {table}.{col} lacks {value!r}")
        return int(hit.iloc[0])

    def title_id(name: str) -> int:
        return dim_id("title", "title", name)

    kw = lambda k: dim_id("keyword", "keyword", k)  # noqa: E731
    kind = lambda k: dim_id("kind_type", "kind", k)  # noqa: E731
    role = lambda r: dim_id("role_type", "role", r)  # noqa: E731
    cct = lambda k: dim_id("comp_cast_type", "kind", k)  # noqa: E731
    link = lambda l: dim_id("link_type", "link", l)  # noqa: E731

    def person(name: str, gender: str, pcode: str) -> int:
        return add(
            "name", name=name, imdb_index=None, imdb_id=None, gender=gender,
            name_pcode_cf=pcode, name_pcode_nf=name[:4].upper(),
            surname_pcode=name.split(",")[0][:3].upper(), md5sum="f" * 32,
        )

    def company(name: str, country: str) -> int:
        return add(
            "company_name", name=name, country_code=country, imdb_id=None,
            name_pcode_nf=name[:4].upper(), name_pcode_sf=name[:3].upper(),
            md5sum="e" * 32,
        )

    def title(name: str, year: int, kind_name: str = "movie") -> int:
        return add(
            "title", title=name, imdb_index=None, kind_id=kind(kind_name),
            production_year=year, imdb_id=None,
            phonetic_code=name[:4].upper(), episode_of_id=None,
            season_nr=None, episode_nr=None, series_years=None,
            md5sum="d" * 32,
        )

    def mc(movie: int, comp: int, ctype: int = 1, note=None) -> int:
        return add(
            "movie_companies", movie_id=movie, company_id=comp,
            company_type_id=ctype, note=note,
        )

    def mi(movie: int, info_name: str, info: str, note=None) -> int:
        return add(
            "movie_info", movie_id=movie, info_type_id=it_id[info_name],
            info=info, note=note,
        )

    def mix(movie: int, info_name: str, info: str) -> int:
        return add(
            "movie_info_idx", movie_id=movie, info_type_id=it_id[info_name],
            info=info, note=None,
        )

    def ci(movie: int, pers: int, note, role_name: str, char: int | None) -> int:
        return add(
            "cast_info", person_id=pers, movie_id=movie, person_role_id=char,
            note=note, nr_order=1, role_id=role(role_name),
        )

    def mk(movie: int, keyword: str) -> int:
        return add("movie_keyword", movie_id=movie, keyword_id=kw(keyword))

    def cc(movie: int, subject: str, status: str) -> int:
        return add(
            "complete_cast", movie_id=movie, subject_id=cct(subject),
            status_id=cct(status),
        )

    def ml(movie: int, linked: int, link_name: str) -> int:
        return add(
            "movie_link", movie_id=movie, linked_movie_id=linked,
            link_type_id=link(link_name),
        )

    def an(pers: int, name: str) -> int:
        return add(
            "aka_name", person_id=pers, name=name, imdb_index=None,
            name_pcode_cf="A100", name_pcode_nf="B100", surname_pcode="C10",
            md5sum="c" * 32,
        )

    def pi(pers: int, info_name: str, info: str, note=None) -> int:
        return add(
            "person_info", person_id=pers, info_type_id=it_id[info_name],
            info=info, note=note,
        )

    def chn(name: str) -> int:
        frame = tables["char_name"]
        hit = frame.loc[frame["name"] == name, "id"]
        if len(hit):
            return int(hit.iloc[0])
        return add(
            "char_name", name=name, imdb_index=None, imdb_id=None,
            name_pcode_nf=name[:4].upper(), surname_pcode=name[:3].upper(),
            md5sum="b" * 32,
        )

    us_co = company("Secret Studios", "[us]")
    dreamworks = company("DreamWorks Animation", "[us]")
    youtube = company("YouTube", "[us]")
    film_de = company("Storm Film AB", "[de]")
    fox = company("Twentieth Century Fox Film Corporation", "[de]")
    jp_co = company("Tokyo Pictures", "[jp]")
    ru_co = company("Moscow Pictures", "[ru]")
    nl_co = company("Polder Film BV", "[nl]")
    lionsgate = dim_id("company_name", "name", "Lionsgate Films") \
        if (tables["company_name"]["name"] == "Lionsgate Films").any() \
        else company("Lionsgate Films", "[us]")

    downey = person("Downey Jr., Robert", "m", "D632")
    bergman = person("Bergman, David", "m", "D450")
    yoko = person("Yoshida, Yoko", "f", "Y230")
    angelina = person("Jolie, Angelina", "f", "J450")
    timothy = person("Underwood, Timothy", "m", "U536")
    frank = person("Anderson, Frank", "m", "A536")

    # -- family 6 + 20: Marvel movie with Downey as Tony Stark ----------
    marvel = title("Iron Man 4", 2015)
    for k in ("marvel-cinematic-universe", "superhero", "sequel",
              "marvel-comics"):
        mk(marvel, k)
    ci(marvel, downey, "(producer)", "actor", chn("Tony Stark"))
    cc(marvel, "cast", "complete")
    mc(marvel, us_co, 1, "(2015) (USA)")

    # -- family 7: featured biography movie (ml.linked_movie_id = t.id) --
    bio = title("The Journey of the Legend", 1982)
    other = title("The Return of the Legend", 1985)
    ci(bio, bergman, None, "director", None)
    pi(bergman, "mini biography", "Born in 1950; director.", "Volker Boehm")
    an(bergman, "David A. Bergman")
    ml(other, bio, "features")

    # -- family 8: Japanese dub (t LIKE 'One Piece%', 2006-2007) ---------
    onepiece = title("One Piece Film Gold", 2007)
    ci(onepiece, yoko, "(voice: English version)", "actress", None)
    an(yoko, "Yoko Y. Yoshida")
    mc(onepiece, jp_co, 1, "(2007) (Japan)")

    # -- families 9/19 on Kung Fu Panda (2008) ---------------------------
    kfp = title_id("Kung Fu Panda")
    ci(kfp, angelina, "(voice)", "actress", chn("Tigress"))
    an(angelina, "Angelina J.")
    mc(kfp, dreamworks, 1, "(2008) (USA)")
    mi(kfp, "release dates", "USA: 6 June 2008", "(theatrical)")

    # -- family 24 (+9c/19c year-open forms): Kung Fu Panda 3 (2012) -----
    kfp3 = title("Kung Fu Panda 3", 2012)
    ci(kfp3, angelina, "(voice)", "actress", chn("Tigress"))
    mc(kfp3, dreamworks, 1, "(2012) (USA)")
    mi(kfp3, "release dates", "USA: 5 March 2012", "(theatrical)")
    for k in ("hero", "martial-arts", "hand-to-hand-combat"):
        mk(kfp3, k)

    # -- family 10: uncredited voice in a Russian movie ------------------
    ru_movie = title("The Storm of the Palace", 2010)
    ci(ru_movie, frank, "(voice) (uncredited)", "actor", chn("Captain"))
    mc(ru_movie, ru_co, 1, "(2010)")

    # -- family 5b: VHS USA 1994 note + USA country info -----------------
    vhs = title("The Dream of the Ocean", 2005)
    mc(vhs, us_co, 1, "(1994) (USA) (VHS)")
    mi(vhs, "countries", "USA")

    # -- families 11/21/27: linked sequels from a Film company -----------
    money = title("The Money of the Storm", 1998)
    money2 = title("The Money of the Storm II", 2001)
    mk(money, "sequel")
    mc(money, film_de, 1, None)  # mc.note IS NULL
    mi(money, "countries", "Germany")
    mi(money, "countries", "Sweden")
    ml(money, money2, "follows")
    cc(money, "cast", "complete")
    garden = title("The Garden of the Storm", 2005)
    mk(garden, "sequel")
    mc(garden, film_de, 1, None)
    mi(garden, "countries", "Germany")
    ml(garden, money2, "follows")
    cc(garden, "cast", "complete")
    # 11c: Fox distributor with a note, sequel keyword, linked
    foxm = title("The Empire of the Quest", 1990)
    mk(foxm, "sequel")
    mc(foxm, fox, 2, "(theatrical)")
    ml(foxm, money2, "followed by")

    # -- family 12b: Birdemic budget + bottom-10 rank --------------------
    birdemic = title_id("Birdemic")
    mi(birdemic, "budget", "$10,000")
    mix(birdemic, "bottom 10 rank", "3")
    mc(birdemic, us_co, 1, "(2010) (USA)")

    # -- family 13: Champion movie with rating + release date ------------
    champ = title("Champion of the Ocean", 2001)
    mi(champ, "release dates", "USA: 3 March 2001")
    mix(champ, "rating", "7.2")
    mc(champ, us_co, 1, "(2001)")

    # -- family 14b: murder-in-title nordic thriller ---------------------
    murder = title("Murder of the Winter", 2012)
    mk(murder, "murder")
    mk(murder, "murder-in-title")
    mi(murder, "countries", "Sweden")
    mix(murder, "rating", "7.5")

    # -- family 15: internet release via YouTube -------------------------
    web = title("The Secret of the Web", 2006)
    mc(web, youtube, 1, "(2006) (worldwide)")
    mi(web, "release dates", "USA: 12 June 2006", "(internet release)")
    mk(web, "web")
    add(
        "aka_title", movie_id=web, title="AKA Secret Web", imdb_index=None,
        kind_id=kind("movie"), production_year=2006, phonetic_code="P100",
        episode_of_id=None, season_nr=None, episode_nr=None,
        note=None, md5sum="a" * 32,
    )

    # -- family 18: male producer Tim with budget + votes ----------------
    prod = title("The Tower of the Night", 2005)
    ci(prod, timothy, "(producer)", "producer", None)
    mi(prod, "budget", "$25,000,000")
    mix(prod, "votes", "125000")

    # -- family 23: complete+verified internet US movie ------------------
    inet = title("The Mirror of the Island", 2005)
    cc(inet, "cast", "complete+verified")
    mi(inet, "release dates", "USA: 14 March 2005", "(internet release)")
    mk(inet, "nerd")
    mc(inet, us_co, 1, "(2005)")

    # -- families 25b/31b: horror writer movie ---------------------------
    vamp = title("Vampire Diary 2", 2012)
    ci(vamp, frank, "(written by)", "writer", None)
    mi(vamp, "genres", "Horror")
    mix(vamp, "votes", "1500")
    for k in ("murder", "blood", "gore"):
        mk(vamp, k)
    mc(vamp, lionsgate, 1, "(2011) (Blu-ray)")

    # -- family 29 on Shrek 2: the full 17-table witness -----------------
    shrek = title_id("Shrek 2")
    ci(shrek, angelina, "(voice)", "actress", chn("Queen"))
    mi(shrek, "release dates", "USA: 19 May 2004")
    mc(shrek, us_co, 1, "(2004) (USA)")
    mk(shrek, "computer-animation")
    cc(shrek, "cast", "complete+verified")
    pi(angelina, "trivia", "Voices the Queen.", None)
    pi(angelina, "height", "5' 7\"", None)

    # -- family 33: linked tv-series pair with ratings -------------------
    series1 = title("The Storm Kingdom", 2004, "tv series")
    series2 = title("The Storm Kingdom II", 2007, "tv series")
    ml(series1, series2, "follows")
    mix(series1, "rating", "8.1")
    mix(series2, "rating", "2.5")
    mc(series1, us_co, 1, "(2004)")
    mc(series1, nl_co, 1, "(2004) (Netherlands)")
    mc(series2, film_de, 1, "(2007)")

    # -- round-11 scale witnesses ----------------------------------------
    # 23 queries matched only by CHANCE in the generated data at the 1x
    # size and went empty on the x10 experiment corpus
    # (experiments/job_corpus_x10.py): the generator's co-occurrence odds
    # shift with n. Every family now has a constructed bundle, so
    # non-vacuity holds at EVERY scale, not just the CI fixture size.

    # family 1c: co-production note + top 250 rank + year > 2010
    coprod = title("The Crown of the North", 2012)
    mc(coprod, us_co, 1, "(2012) (worldwide) (co-production)")
    mix(coprod, "top 250 rank", "117")

    # families 3b / 4b: sequel keyword + Bulgaria country + 9+ rating
    bulg = title("The Shadow Returns", 2012)
    mk(bulg, "sequel")
    mi(bulg, "countries", "Bulgaria")
    mix(bulg, "rating", "9.2")

    # family 5a: French theatrical production, Germanic country info
    euro = title("The Winter Palace", 2007)
    mc(euro, film_de, 1, "(2006) (France) (theatrical)")
    mi(euro, "countries", "Germany")

    # family 10b: Russian movie with an actor-producer, year > 2010
    ru2 = title("The Iron Tsar", 2012)
    ci(ru2, frank, "(producer)", "actor", chn("Captain"))
    mc(ru2, ru_co, 1, "(2012)")

    # family 16a: series episode 50-99 named after its character
    epi = add(
        "title", title="The Falcon: Part 60", imdb_index=None,
        kind_id=kind("episode"), production_year=2009, imdb_id=None,
        phonetic_code="F425", episode_of_id=None, season_nr=3,
        episode_nr=60, series_years=None, md5sum="d" * 32,
    )
    falcon = person("Falconer, Fred", "m", "F425")
    an(falcon, "Freddy Falcon")
    ci(epi, falcon, None, "actor", chn("Captain"))
    mk(epi, "character-name-in-title")
    mc(epi, us_co, 1, "(2009) (USA)")

    # families 17b/17c: Z- and X-named members of a charnamed US movie
    zx = title("The Man of the House", 2003)
    mk(zx, "character-name-in-title")
    mc(zx, us_co, 1, "(2003) (USA)")
    zack = person("Zimmerman, Zack", "m", "Z516")
    xand = person("Xavier, Xander", "m", "X160")
    ci(zx, zack, None, "actor", chn("The Man"))
    ci(zx, xand, None, "actor", chn("Doctor"))

    # family 18b: female writer on a high-rated note-less Horror
    fem = title("The Silent Ward", 2010)
    ci(fem, angelina, "(written by)", "writer", None)
    mi(fem, "genres", "Horror")  # note stays NULL
    mix(fem, "rating", "8.4")

    # family 20c: the complete-cast superhero movie gains a %Man%
    # character row (Tony Stark alone misses the LIKE)
    ci(marvel, downey, None, "actor", chn("Iron Man"))

    # families 22a-d / 28a-c: non-US 200x-noted Germanic murder movie
    dark = title("The Long Dark", 2012)
    mk(dark, "murder")
    mc(dark, film_de, 2, "(2009) (worldwide)")
    mi(dark, "countries", "Germany")
    mix(dark, "rating", "6.8")
    cc(dark, "crew", "complete")  # 28a/b: crew + <> complete+verified
    cc(dark, "cast", "complete")  # 28c: cast + complete

    # families 26a-c: complete+verified superhero, %Man% char, 8+ rating
    hero = title("The Man of Steel Returns", 2012)
    mk(hero, "superhero")
    ci(hero, downey, None, "actor", chn("Superman"))
    cc(hero, "cast", "complete+verified")
    mix(hero, "rating", "8.4")

    # families 30a-c: complete+verified violent Horror by a male writer
    viol = title("The Butcher of Prague", 2012)
    for k in ("murder", "blood"):
        mk(viol, k)
    ci(viol, frank, "(written by)", "writer", None)
    mi(viol, "genres", "Horror")
    mix(viol, "votes", "2200")
    cc(viol, "cast", "complete+verified")

    for name, rows in added.items():
        if not rows:
            continue
        frame = tables[name]
        patch = pd.DataFrame(rows)
        # align to the table's schema: absent columns become NULL, dtypes
        # follow the existing frame (nullable ints stay Int64)
        for col in frame.columns:
            if col not in patch.columns:
                patch[col] = None
        patch = patch[list(frame.columns)]
        for col in frame.columns:
            try:
                patch[col] = patch[col].astype(frame[col].dtype)
            except (TypeError, ValueError):
                pass
        tables[name] = pd.concat([frame, patch], ignore_index=True)


IMDB_TABLES = [
    "aka_name", "aka_title", "cast_info", "char_name", "comp_cast_type",
    "company_name", "company_type", "complete_cast", "info_type", "keyword",
    "kind_type", "link_type", "movie_companies", "movie_info",
    "movie_info_idx", "movie_keyword", "movie_link", "name", "person_info",
    "role_type", "title",
]
