"""Deterministic synthetic corpus + goldens generator (FIXTURES.md).

Generates the input table in the exact ``input_hint`` shape
``(repo, path, commit, lang, content)`` plus ``content_sha256`` for the
per-row invariant, an entity registry, broadcast dictionaries, and golden
tables (``expected_mentions``, ``expected_triples``, ``expected_matches``,
``expected_components``) — the analog of the reference's golden per-step
state files (`src/pipeline/state/ECLI_BE_CASS_2026_ARR.20260116.1F.2_FR/`).

Everything is a pure function of (seed, index) via sha256 — no ``random``
module state, no clock — so content hashes and goldens are reproducible
across runs and across Spark workers (FIXTURES.md §7). Small scales build
goldens in pandas; bench scale generates documents distributedly with
``mapInPandas`` over ``spark.range`` (see :func:`documents_df`).

Planted pattern families mirror the reference regex families
(SURVEY.md §2.7): identifier citations (ECLI analog,
`regex-extractor.ts:240-243`), name+date triggers with FR/NL month names
(`regex-extractor.ts:308-335`), provision snippets ("rule N of X",
`provisionSnippetExtractor.ts:50-59`), parties, CELEX/NUMAC-style codes
with deliberately-invalid checksum variants (`referenceExtractorN8N.ts:94-202`),
valid/broken URLs, and planted self-references that extraction must filter
(`regex-extractor.ts:252-255`).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import pandas as pd

from ..functions.ids import doc_uid_py
from ..functions.text import length_category_py

SEED = 42

# ---------------------------------------------------------------- determinism


def _h(*parts: object) -> int:
    """Pure 64-bit hash of the parts (seeded); the only entropy source."""
    key = ":".join(str(p) for p in (SEED, *parts))
    return int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "big")


def _pick(pool: list[str], *parts: object) -> str:
    return pool[_h(*parts) % len(pool)]


# ------------------------------------------------------------------ word pools

FILLER = (
    "scan filter join merge batch vector column row table index shard lease "
    "commit branch module symbol token parse emit fold graph node edge probe "
    "spill sort hash range lookup buffer stream stage plan task slot queue"
).split()

ADJ = "core shared stable legacy unified portable secure open internal public".split()
NOUN = "runtime protocol storage schema registry kernel channel ledger matrix codec".split()

ORG_STEMS = [
    "Helios", "Borealis", "Meridian", "Atlas", "Vertex", "Quanta", "Nimbus",
    "Aurora", "Zenith", "Strata", "Fennec", "Kestrel", "Lumen", "Cobalt",
    "Argon", "Delta", "Echo", "Falcon", "Granite", "Harbor", "Iris",
    "Juniper", "Krypton", "Larch", "Mistral",
]
ORG_SUFFIX = ["Council", "Board", "Chamber", "Tribunal", "Committee"]
ALIAS_FORMS = [
    "{stem} {suf}",
    "{stem} {suf} ({abbr})",
    "the {stem} {suf}",
    "{abbr}",
    "{stem}-{suf}",
    "{stem} {suf} first chamber",
    "{stem} {suf} second chamber",
    "{stem} review {suf}",
    "{stem} appeals {suf}",
    "{stem} central {suf}",
]

PARTY_STEMS = [
    "Alphatech", "Bravosoft", "Carmine", "Dorian", "Everest", "Fairline",
    "Gallium", "Hyperion", "Ibexa", "Jovian", "Kelvin", "Lorentz",
]
PARTY_SUFFIX = ["Corp", "NV", "GmbH", "Ltd", "SA", "BV"]

# FR/NL month names — the exact bilingual date-trigger family of
# `regex-extractor.ts:308-335`.
MONTHS_FR = [
    "janvier", "février", "mars", "avril", "mai", "juin", "juillet",
    "août", "septembre", "octobre", "novembre", "décembre",
]
MONTHS_NL = [
    "januari", "februari", "maart", "april", "mei", "juni", "juli",
    "augustus", "september", "oktober", "november", "december",
]

LANGS = ["py", "ts", "java", "go"]

# ------------------------------------------------------------------- registry


def _slug(k: int) -> str:
    """5-letter deterministic slug — keeps distinct entity titles textually
    far apart so near-dup detection only fires on planted duplicates."""
    v = _h("slug", k)
    return "".join(chr(ord("a") + (v >> (5 * j)) % 26) for j in range(5))


def _title(k: int) -> str:
    return f"{_pick(ADJ, 'adj', k)} {_pick(NOUN, 'noun', k)} {_slug(k)} charter {k:03d}"


def _mutate(title: str, n_edits: int, salt: int) -> str:
    """Deterministically perturb letters (never the 'charter NNN' suffix)."""
    head, _, tail = title.rpartition(" charter ")
    chars = list(head)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    edits = 0
    step = 0
    while edits < n_edits and step < 50:
        pos = _h("mut", salt, title, step) % len(chars)
        if chars[pos].isalpha():
            repl = alpha[_h("mutc", salt, title, step) % 26]
            if repl != chars[pos]:
                chars[pos] = repl
                edits += 1
        step += 1
    return f"{''.join(chars)} charter {tail}"


def _vf(k: int) -> str:
    """Registry valid_from rule: every 9th entity is a 2030 decoy
    (temporal-cutoff exercise); otherwise 2000-2009 by k."""
    return "2030-01-01" if k % 9 == 8 else f"20{k % 10:02d}-01-01"


@dataclass
class RegistryBundle:
    entity_registry: pd.DataFrame
    popular_entities: pd.DataFrame
    family_map: pd.DataFrame
    alias_map: pd.DataFrame
    known_missing: pd.DataFrame
    expected_components: pd.DataFrame
    # lookup helpers for the corpus generator
    titles: dict[str, str] = field(default_factory=dict)  # entity_id -> title
    popular_ids: list[str] = field(default_factory=list)
    plain_ids: list[str] = field(default_factory=list)
    org_codes: list[str] = field(default_factory=list)
    org_alias: dict[str, str] = field(default_factory=dict)  # alias -> code
    alias_display: dict[str, str] = field(default_factory=dict)  # norm -> raw
    dup_variant_of: dict[str, str] = field(default_factory=dict)
    family_members: dict[str, list[str]] = field(default_factory=dict)
    entity_vf: dict[str, str] = field(default_factory=dict)


def gen_registry(n_canonical: int = 80, n_dup_chains: int = 8) -> RegistryBundle:
    """Entity registry + broadcast dictionaries (FIXTURES.md §2-3)."""
    rows = []
    titles: dict[str, str] = {}
    for k in range(n_canonical):
        eid = f"E{k:04d}"
        t = _title(k)
        titles[eid] = t
        # valid_from: temporal-cutoff predicate exercise
        # (`mapping/steps.ts:452-454`).
        rows.append((eid, t, "charter", _vf(k), f"rule-{k % 7}", f"member text for {t}"))

    # Duplicate chains A-B-C (B close to A, C close to B, A-C farther) —
    # exercises connected components beyond pairwise dedup (FIXTURES.md §5).
    comp_rows = []
    dup_variant_of: dict[str, str] = {}
    for c in range(n_dup_chains):
        base_k = 200 + c
        a = f"E{base_k:04d}"
        b = f"E{base_k:04d}X"
        cc = f"E{base_k:04d}XX"
        ta = _title(base_k)
        tb = _mutate(ta, 2, 1)
        tc = _mutate(tb, 2, 2)
        for eid, t in ((a, ta), (b, tb), (cc, tc)):
            titles[eid] = t
            rows.append((eid, t, "charter", "2001-01-01", "rule-0", f"member text for {t}"))
        for eid in (a, b, cc):
            comp_rows.append((eid, a))  # canonical = min id in component
            if eid != a:
                dup_variant_of[eid] = a

    # Boundary-date fixture (round-1 ADVICE): one entity whose valid_from
    # EQUALS corpus doc 7's doc_date ("2022-08-08"). The reference's
    # temporal cutoff is strict (`dossier date < decisionDate`,
    # mapping/steps.ts:452-454), so the exact-title mention planted in
    # doc 7 must stay unmatched — an inclusive (<=) cutoff would link it.
    titles["E0300"] = _title(300)
    rows.append(("E0300", titles["E0300"], "charter", "2022-08-08", "rule-0",
                 f"member text for {titles['E0300']}"))

    entity_registry = pd.DataFrame(
        rows,
        columns=["entity_id", "title", "entity_type", "valid_from", "member_key", "member_text"],
    )

    # Popular dictionary: 64 exact lowercased titles (popular-laws analog,
    # `mapping/steps.ts:30-44`). Matches emit score=100 (steps.ts:309-320).
    popular_ids = [f"E{k:04d}" for k in range(0, 64) if k % 9 != 8]
    popular_entities = pd.DataFrame(
        [(titles[e].lower().strip(), e) for e in popular_ids],
        columns=["name_norm", "entity_id"],
    )

    # Family map: 47 families, one hub family with 20 ids
    # (code-mapping.json analog — `Code civil` -> 20 NUMACs, steps.ts:46-49).
    fam_rows = []
    family_members: dict[str, list[str]] = {}
    for f_i in range(47):
        if f_i == 0:
            ids = [f"E{k:04d}" for k in range(20)]  # the hub
        else:
            ids = [f"E{(f_i * 3 + j) % n_canonical:04d}" for j in range(1 + f_i % 3)]
        fam_rows.append((f"family-{f_i:02d}", ids))
        family_members[f"family-{f_i:02d}"] = ids
    family_map = pd.DataFrame(fam_rows, columns=["family", "entity_ids"])
    entity_vf = {f"E{k:04d}": _vf(k) for k in range(n_canonical)}

    # Alias map: 247 rows alias -> org code (court-mapping.csv analog).
    # ``region`` is the court's location column (regex-extractor.ts:180-208
    # fallback: jurisdiction from the court token's mapped location).
    org_codes = [f"ORG-{s.upper()}" for s in ORG_STEMS]
    alias_rows = []
    org_alias: dict[str, str] = {}
    alias_display: dict[str, str] = {}
    for i, stem in enumerate(ORG_STEMS):
        suf = ORG_SUFFIX[i % len(ORG_SUFFIX)]
        abbr = "".join(w[0] for w in (stem, suf)).upper() + str(i)
        for form in ALIAS_FORMS:
            alias = form.format(stem=stem, suf=suf, abbr=abbr)
            alias_rows.append((alias, org_codes[i], f"{stem} {suf}", f"LOC-{i % 8:02d}"))
            org_alias[alias.lower().strip()] = org_codes[i]
            alias_display[alias.lower().strip()] = alias
            if len(alias_rows) == 247:
                break
        if len(alias_rows) == 247:
            break
    alias_map = pd.DataFrame(
        alias_rows, columns=["alias", "canonical_code", "official_name", "region"]
    )

    known_missing = pd.DataFrame(
        {"name_norm": ["obsolete accord", "withdrawn pact", "unknown consortium"]}
    )
    expected_components = pd.DataFrame(comp_rows, columns=["entity_ref", "canonical_id"])

    plain_ids = [f"E{k:04d}" for k in range(64, n_canonical) if k % 9 != 8]
    return RegistryBundle(
        entity_registry=entity_registry,
        popular_entities=popular_entities,
        family_map=family_map,
        alias_map=alias_map,
        known_missing=known_missing,
        expected_components=expected_components,
        titles=titles,
        popular_ids=popular_ids,
        plain_ids=plain_ids,
        org_codes=org_codes,
        org_alias=org_alias,
        alias_display=alias_display,
        dup_variant_of=dup_variant_of,
        family_members=family_members,
        entity_vf=entity_vf,
    )


# ------------------------------------------------------------------ documents


def _doc_ident(j: int) -> str:
    """The doc-identifier grammar (ECLI analog): ``DOC:rr:nnnnnnn``.
    7-digit index keeps idents unique to 10^7 docs (5 digits collided at
    bench scale, fanning out the cites join)."""
    return f"DOC:{j % 100:02d}:{j % 10_000_000:07d}"


def _doc_date(i: int) -> str:
    """The document's own decision date (ISO)."""
    return f"20{15 + i % 10:02d}-{1 + i % 12:02d}-{1 + i % 28:02d}"


def _case_number(i: int) -> str:
    """Cassation-style case number, canonical dotted form
    (`regex-extractor.ts:341-360` grammar analog): ``L.YY.NNNN.L``.
    Unique per index for i < 9000 (golden scales are far below that)."""
    return f"{'CDFGHPS'[i % 7]}.{i % 100:02d}.{1000 + i % 9000:04d}.{'NFD'[i % 3]}"


def _org_norm_of(i: int, reg: "RegistryBundle") -> str:
    """The normalized alias this doc's NAME_DATE plant uses."""
    alias_pool = sorted(reg.org_alias.keys())
    return alias_pool[_h("org", i) % len(alias_pool)]


def org_code_of(i: int, reg: "RegistryBundle") -> str:
    """The org code doc *i* was decided by (its NAME_DATE plant)."""
    return reg.org_alias[_org_norm_of(i, reg)]


def _date_str(i: int, k: int) -> str:
    """A planted date in one of three formats: numeric, FR month, NL month."""
    day = 1 + _h("dd", i, k) % 28
    month = 1 + _h("dm", i, k) % 12
    year = 2015 + _h("dy", i, k) % 10
    form = _h("df", i, k) % 3
    if form == 0:
        return f"{day:02d}/{month:02d}/{year}"
    if form == 1:
        return f"{day} {MONTHS_FR[month - 1]} {year}"
    return f"{day} {MONTHS_NL[month - 1]} {year}"


def _filler(i: int, block: int, target_chars: int) -> str:
    """Deterministic filler: 32 words per sha256 digest (one hash per word
    was the generator hot spot at bench scale)."""
    words = []
    n = 0
    chunk = 0
    while n < target_chars:
        digest = hashlib.sha256(f"{SEED}:fill:{i}:{block}:{chunk}".encode()).digest()
        for byte in digest:
            w = FILLER[byte % len(FILLER)]
            words.append(w)
            n += len(w) + 1
            if n >= target_chars:
                break
        chunk += 1
    return " ".join(words)


@dataclass
class _DocBuild:
    parts: list[str] = field(default_factory=list)
    pos: int = 0
    mentions: list[dict] = field(default_factory=list)

    def filler(self, i: int, block: int, chars: int) -> None:
        s = _filler(i, block, chars) + " "
        self.parts.append(s)
        self.pos += len(s)

    def plant(self, kind: str, surface: str, lead: str = "", trail: str = " ", **extra):
        self.parts.append(lead)
        self.pos += len(lead)
        start = self.pos
        self.parts.append(surface)
        self.pos += len(surface)
        self.mentions.append(
            {"mention_kind": kind, "surface": surface,
             "char_start": start, "char_end": start + len(surface), **extra}
        )
        self.parts.append(trail)
        self.pos += len(trail)


CLUSTER_DISTANCE = 500  # `regex-extractor.ts:425`
WINDOW_SIZE = 1200      # `regex-extractor.ts:481`

# Citation triggers participate in gap-clustering (regex-extractor.ts:425:
# ecli, case-number and court+date trigger families all cluster).
_CLUSTERED_KINDS = {"IDENT", "NAME_DATE", "CASE_NUM", "COURT_DATE"}


def assign_clusters(mentions: list[dict]) -> None:
    """Gap-≤500 clustering over citation triggers (`regex-extractor.ts:425-475`).

    Mutates each mention dict, adding ``cluster_id`` (-1 for kinds that do
    not participate) and per-mention confidence.
    """
    cid = -1
    last_end = None
    for m in sorted(mentions, key=lambda m: m["char_start"]):
        if m["mention_kind"] in _CLUSTERED_KINDS:
            if last_end is None or m["char_start"] - last_end > CLUSTER_DISTANCE:
                cid += 1
            m["cluster_id"] = cid
            last_end = m["char_end"]
        else:
            m["cluster_id"] = -1
        m["confidence"] = {
            "IDENT": "HIGH", "CASE_NUM": "HIGH",
            "NAME_DATE": "MEDIUM", "COURT_DATE": "MEDIUM",
        }.get(m["mention_kind"], "LOW")


def build_document(i: int, n_docs: int, reg: RegistryBundle) -> tuple[dict, list[dict], list[dict], list[dict], list[dict]]:
    """Build doc *i*: row dict, mentions goldens, triple goldens, match
    goldens, citation-evidence goldens (tiered, citation-finder analog)."""
    repo = f"org/proj-{i % 20:02d}"
    lang = LANGS[i % len(LANGS)]
    path = f"src/pkg{i // 50:03d}/mod_{i:05d}.{lang}"
    commit = hashlib.sha256(f"{SEED}:commit:{i}".encode()).hexdigest()[:8]
    uid = doc_uid_py(repo, path, commit)
    doc_date = _doc_date(i)

    b = _DocBuild()
    triples: list[tuple[str, str, str]] = []
    matches: list[dict] = []
    citations: list[dict] = []
    seen_targets: set[int] = set()

    def _cite_row(t: int, tier: int, org_override: str | None = None) -> dict:
        return {
            "doc_id": uid, "target_id": doc_uid_of(t),
            "ident": _doc_ident(t), "case_canonical": _case_number(t),
            "org_code": org_override or org_code_of(t, reg),
            "decision_date": _doc_date(t), "tier": tier,
        }

    b.filler(i, 0, 100 + _h("f0", i) % 300)

    # -- own case number (cassation grammar, regex-extractor.ts:341-360)
    b.plant("CASE_NUM", _case_number(i), lead="Case No ", trail=". ")

    # -- parties (70% of docs) → PARTY mentions + party_of triples
    if _h("haspar", i) % 10 < 7:
        pa = f"{_pick(PARTY_STEMS, 'pa', i)} {_pick(PARTY_SUFFIX, 'pas', i)}"
        pb = f"{_pick(PARTY_STEMS, 'pb', i, 1)} {_pick(PARTY_SUFFIX, 'pbs', i, 1)}"
        if pb == pa:
            pb = f"{PARTY_STEMS[(_h('pb2', i) % (len(PARTY_STEMS) - 1) + 1)]} Ltd"
        b.plant("PARTY", f"PARTIES: {pa} vs {pb}", trail=". ")
        for seq, _name in enumerate((pa, pb), start=1):
            triples.append((f"PARTY-{uid}-{seq:03d}", "party_of", f"DEC-{uid}"))

    b.filler(i, 1, 200 + _h("f1", i) % 200)

    # -- citations: IDENT mentions → cites triples (self-cites filtered)
    n_cites = _h("nc", i) % 4
    own = _doc_ident(i)
    for k in range(n_cites):
        target = (i * 31 + k * 17 + 7) % n_docs
        if target == i:
            target = (target + 1) % n_docs
        b.plant("IDENT", _doc_ident(target), lead="see ", trail=" ; ")
        triples.append((f"DEC-{uid}", "cites", f"DEC-{doc_uid_of(target)}"))
        if target not in seen_targets:
            seen_targets.add(target)
            citations.append(_cite_row(target, 1))
        # small gap (same cluster) or big gap (new cluster)
        gap = 120 if _h("gap", i, k) % 2 == 0 else 700 + _h("gap2", i, k) % 500
        b.filler(i, 10 + k, gap)
    if _h("self", i) % 5 == 0:
        # planted self-reference — must be extracted then filtered
        # (`regex-extractor.ts:252-255`); no triple emitted.
        b.plant("IDENT", own, lead="as held in ", trail=" . ", self_ref=True)
        b.filler(i, 20, 150)

    # -- tiered citation-evidence fixtures (citation-finder.ts:48-313):
    # tier 2: cite a target ONLY by case number (dotted or spaced variant);
    # tier 3: cite by court token + ISO date in proximity; tier 4: the
    # candidate record claims this doc's own court (token present, no
    # matching date) — court-only evidence. A '¶ '-prefixed case number is
    # planted raw (NOT a golden mention): the paragraph-reference negative
    # filter (regex-extractor.ts:362-368) must drop it.
    t3_date_planted = None
    if _h("t2cite", i) % 6 == 0 and n_docs > 1:
        t2 = (i * 13 + 5) % n_docs
        if t2 == i:
            t2 = (t2 + 1) % n_docs
        if t2 not in seen_targets:
            seen_targets.add(t2)
            cn = _case_number(t2)
            surface = cn if _h("t2v", i) % 2 == 0 else cn.replace(".", " ")
            b.plant("CASE_NUM", surface, lead="compare case ", trail=" ; ")
            citations.append(_cite_row(t2, 2))
            b.filler(i, 21, 80 + _h("t2f", i) % 120)
    if _h("t3cite", i) % 8 == 0 and n_docs > 1:
        t3 = (i * 7 + 3) % n_docs
        if t3 == i:
            t3 = (t3 + 1) % n_docs
        if t3 not in seen_targets:
            seen_targets.add(t3)
            alias_disp = reg.alias_display[_org_norm_of(t3, reg)]
            t3_date_planted = _doc_date(t3)
            b.plant("COURT_DATE", f"per {alias_disp} dated {t3_date_planted}",
                    trail=". ")
            citations.append(_cite_row(t3, 3))
            b.filler(i, 22, 80 + _h("t3f", i) % 120)
    if _h("t4cite", i) % 8 == 1 and n_docs > 1:
        t4 = (i * 11 + 9) % n_docs
        if t4 == i:
            t4 = (t4 + 1) % n_docs
        if t4 not in seen_targets and _doc_date(t4) != t3_date_planted:
            seen_targets.add(t4)
            citations.append(_cite_row(t4, 4, org_override=org_code_of(i, reg)))
    if _h("pneg", i) % 4 == 0:
        neg = "¶ C-999/99 "
        b.parts.append(neg)
        b.pos += len(neg)
    if _h("eu", i) % 7 == 0:
        # positive EU-form case number (C-nnn/yy family)
        b.plant("CASE_NUM", f"C-{1 + _h('eun', i) % 999}/{10 + _h('euy', i) % 90}",
                lead="cf. ", trail=" ; ")
    if _h("bib", i) % 5 == 0:
        # biblio scan analog (journal abbrev + year, regex-extractor.ts:386-408)
        j1 = ["Rev", "Bull", "Ann", "J"][_h("bj", i) % 4]
        j2 = ["Proto", "Leg", "Arb", "Com"][_h("bk", i) % 4]
        b.plant("BIBLIO", f"{j1}. {j2}. {1990 + _h('by', i) % 35}, {1 + _h('bp', i) % 999}",
                lead="cf. ", trail=" ; ")

    # -- name+date (decided_by): alias + date within one cluster window
    alias_norm = _org_norm_of(i, reg)
    alias_disp = reg.alias_display[alias_norm]
    org_code = reg.org_alias[alias_norm]
    date_s = _date_str(i, 0)
    b.plant("NAME_DATE", f"Reviewed by {alias_disp} on {date_s}", trail=". ",
            org_code=org_code)
    triples.append((f"DEC-{uid}", "decided_by", org_code))
    matches.append({"mention_uid": f"{uid}:NAME_DATE:1", "entity_id": org_code,
                    "matched_on": "DICT", "score": 100})

    # occasionally a known-missing org (skip path, `mapping/steps.ts:100-103`)
    if _h("miss", i) % 11 == 0:
        b.plant("NAME_DATE", f"Reviewed by obsolete accord on {_date_str(i, 1)}",
                trail=". ", org_code=None)

    b.filler(i, 2, 600 + _h("f2", i) % 400)

    # -- provisions: "rule N of <title>" → applies_provision triples.
    # Path mix: DICT (popular exact) / EXACT_ID ("rule N of E0042") /
    # SIMILARITY (edit-distance variant of a plain title) /
    # DUP (variant entity id → canonicalization rewrites to chain head).
    n_rules = _h("nr", i) % 3
    rule_seq = 0
    for k in range(n_rules):
        rule_seq += 1
        rn = 1 + _h("rn", i, k) % 120
        path_kind = _h("rp", i, k) % 4
        if path_kind == 0:
            eid = reg.popular_ids[_h("re", i, k) % len(reg.popular_ids)]
            surface_title = reg.titles[eid]
            matched_on = "DICT"
        elif path_kind == 1:
            eid = reg.plain_ids[_h("re", i, k) % len(reg.plain_ids)]
            surface_title = eid  # direct id citation — ECLI-equality analog
            matched_on = "EXACT_ID"
        elif path_kind == 2:
            eid = reg.plain_ids[_h("re", i, k) % len(reg.plain_ids)]
            surface_title = _mutate(reg.titles[eid], 1, 3)
            matched_on = "SIMILARITY"
        else:
            dups = sorted(reg.dup_variant_of)
            dup = dups[_h("re", i, k) % len(dups)]
            eid = dup  # linking resolves to dup id; canonicalization rewrites
            surface_title = reg.titles[dup]
            matched_on = "SIMILARITY"  # exact title hit via the similarity path
        b.plant("RULE", f"rule {rn} of {surface_title}", lead="as stated in ",
                trail=", ", entity_id=eid, rule_num=rn)
        canonical = reg.dup_variant_of.get(eid, eid)
        triples.append((f"DEC-{uid}", "applies_provision", f"ART-{canonical}-{rn:03d}"))
        matches.append({"mention_uid": f"{uid}:RULE:{rule_seq}", "entity_id": eid,
                        "matched_on": matched_on, "score": -1})
        b.filler(i, 30 + k, 150 + _h("f3", i, k) % 200)

    # -- family mention (key-list fanout, mapping/steps.ts:429-465): the
    # family expands to its member entity ids; candidates are gated by the
    # temporal cutoff valid_from < doc_date; deterministic pick = min id.
    if _h("fam", i) % 4 == 0:
        fam_i = _h("famf", i) % 47
        fam = f"family-{fam_i:02d}"
        rn = 1 + _h("famrn", i) % 50
        b.plant("FAMILY", f"rule {rn} of {fam}", lead="pursuant to ", trail=". ")
        valid_members = [e for e in reg.family_members[fam]
                         if reg.entity_vf[e] < doc_date]
        if valid_members:
            eid = min(valid_members)
            canonical = reg.dup_variant_of.get(eid, eid)
            triples.append(
                (f"DEC-{uid}", "applies_provision", f"ART-{canonical}-{rn:03d}")
            )

    # -- hub entity: ~30% of docs cite popular entity #0 (the
    # frequently-cited-decision skew case, BASELINE.json:14; resolved on
    # the broadcast DICT fast path, so the hub never fans into the scorer)
    if _h("hub", i) % 10 < 3:
        rule_seq += 1
        rn = 1 + _h("hubrn", i) % 120
        hub_eid = reg.popular_ids[0]
        b.plant("RULE", f"rule {rn} of {reg.titles[hub_eid]}", lead="see also ",
                trail=". ", entity_id=hub_eid, rule_num=rn)
        triples.append((f"DEC-{uid}", "applies_provision", f"ART-{hub_eid}-{rn:03d}"))
        matches.append({"mention_uid": f"{uid}:RULE:{rule_seq}", "entity_id": hub_eid,
                        "matched_on": "DICT", "score": 100})

    # -- boundary-date fixture (doc 7 only): cite E0300's exact title; its
    # valid_from equals THIS doc's doc_date, so the strict cutoff must
    # leave the mention unmatched — no match golden, no triple
    # (tests/test_linking.py::test_boundary_date_mention_unmatched).
    if i == 7:
        rule_seq += 1
        rn = 1 + _h("bndrn", i) % 120
        b.plant("RULE", f"rule {rn} of {reg.titles['E0300']}",
                lead="subject to ", trail=". ", entity_id=None, rule_num=rn)

    # -- reference codes (agent-2B analog): valid + invalid variants
    year_ok = 1990 + _h("cy", i) % 30
    b.plant("REF", f"CELEX:3{year_ok}L{_h('cn', i) % 10000:04d}", ref_valid=True)
    if _h("badc", i) % 3 == 0:
        b.plant("REF", f"CELEX:3{2077}L{_h('cn2', i) % 10000:04d}", ref_valid=False)
    month_ok = 1 + _h("nm", i) % 12
    b.plant("REF", f"{2000 + _h('ny', i) % 25}{month_ok:02d}{_h('nn', i) % 10000:04d}",
            lead="numac ", ref_valid=True)
    if _h("badn", i) % 3 == 1:
        # 10 digits but month=77 → extracted, fails validation
        # (verified-vs-extracted split, referenceExtractorN8N.ts:94-202)
        b.plant("REF", f"{2005}77{_h('nn2', i) % 10000:04d}", lead="numac ", ref_valid=False)
    b.plant("REF", f"https://lex.example.eu/legal-content/{uid[:8]}", ref_valid=True)

    # -- tail filler: size spread 2K–120K analog (most short, few long);
    # every 10007th doc is a mega-doc (~120K chars) — the skew case of
    # FIXTURES.md §7 / BASELINE.json:14
    spread = _h("size", i) % 100
    if i % 10007 == 7:
        tail = 120_000
    elif spread < 70:
        tail = 800 + _h("t", i) % 2000
    elif spread < 95:
        tail = 4000 + _h("t", i) % 8000
    else:
        tail = 20000 + _h("t", i) % 30000
    b.filler(i, 99, tail)

    content = "".join(b.parts)
    assign_clusters(b.mentions)
    for seq, m in enumerate(sorted(b.mentions, key=lambda m: m["char_start"]), start=1):
        m["mention_seq"] = seq
        m["doc_id"] = uid
        m["lang"] = lang

    row = {
        "repo": repo, "path": path, "commit": commit, "lang": lang,
        "content": content,
        "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
        "doc_ident": own,
        "doc_date": doc_date,
        "md_length": len(content),
        "length_category": length_category_py(len(content)),
    }
    t_rows = [{"subj": s, "pred": p, "obj": o} for s, p, o in triples]
    return row, b.mentions, t_rows, matches, citations


# doc_uid depends only on (i) through repo/path/commit; precompute helper
def doc_uid_of(i: int) -> str:
    repo = f"org/proj-{i % 20:02d}"
    lang = LANGS[i % len(LANGS)]
    path = f"src/pkg{i // 50:03d}/mod_{i:05d}.{lang}"
    commit = hashlib.sha256(f"{SEED}:commit:{i}".encode()).hexdigest()[:8]
    return doc_uid_py(repo, path, commit)


@dataclass
class CorpusBundle:
    documents: pd.DataFrame
    expected_mentions: pd.DataFrame
    expected_triples: pd.DataFrame
    expected_matches: pd.DataFrame
    expected_citations: pd.DataFrame


def gen_corpus(n_docs: int, reg: RegistryBundle | None = None) -> CorpusBundle:
    reg = reg or gen_registry()
    doc_rows, mention_rows, triple_rows, match_rows, cite_rows = [], [], [], [], []
    for i in range(n_docs):
        row, ms, ts, mas, cis = build_document(i, n_docs, reg)
        doc_rows.append(row)
        mention_rows.extend(ms)
        triple_rows.extend(ts)
        match_rows.extend(mas)
        cite_rows.extend(cis)
    mention_cols = ["doc_id", "lang", "mention_seq", "mention_kind", "surface",
                    "char_start", "char_end", "cluster_id", "confidence"]
    mentions = pd.DataFrame(mention_rows)
    for c in mention_cols:
        if c not in mentions.columns:
            mentions[c] = None
    cite_cols = ["doc_id", "target_id", "ident", "case_canonical",
                 "org_code", "decision_date", "tier"]
    return CorpusBundle(
        documents=pd.DataFrame(doc_rows),
        expected_mentions=mentions[mention_cols + [c for c in ("self_ref", "entity_id", "rule_num", "org_code", "ref_valid") if c in mentions.columns]],
        expected_triples=pd.DataFrame(triple_rows).drop_duplicates(),
        expected_matches=pd.DataFrame(match_rows),
        expected_citations=pd.DataFrame(cite_rows, columns=cite_cols),
    )


def gen_test_set(bundle: CorpusBundle, per_stratum: int = 2) -> pd.DataFrame:
    """Stratified evaluation slice (comprehensive-197.csv analog,
    FIXTURES.md §4): up to ``per_stratum`` docs per (lang, length_category),
    deterministic (sorted by doc key within stratum)."""
    docs = bundle.documents.copy()
    docs["doc_id"] = [
        doc_uid_py(r, p, c)
        for r, p, c in zip(docs["repo"], docs["path"], docs["commit"])
    ]
    rows = []
    for (_lang, _cat), grp in sorted(
        docs.groupby(["lang", "length_category"]), key=lambda kv: kv[0]
    ):
        take = grp.sort_values("doc_id").head(per_stratum)
        for r in take.itertuples():
            rows.append((r.doc_id, r.lang, "decision", r.repo.split("/")[1],
                         r.repo, "standard", r.doc_date, r.md_length,
                         r.length_category))
    return pd.DataFrame(rows, columns=[
        "doc_id", "lang", "doc_type", "source_code", "source_name",
        "category", "doc_date", "md_length", "length_category",
    ])


# ------------------------------------------------------------- Spark surfaces

_CORPUS_ROOT_CACHE: dict[int, str] = {}


def corpus_parquet_root(n_docs: int) -> str:
    """Materialize the deterministic corpus as parquet under /tmp and
    return the directory (round-4 VERDICT item 1: both engines of the
    correctness gate read the SAME bits, so the flagship regex+join
    queries get real DuckDB oracles instead of rows-only checks).

    Contents: ``documents.parquet`` (corpus rows + the python-minted
    ``doc_id`` — the Spark side re-mints it with the column-expression
    ``doc_uid``, so a hash-green oracle row also proves id-mint parity),
    ``alias_map.parquet``, ``citation_candidates.parquet`` (the
    expected-citations records sans the ``tier`` answer column), and the
    registry tables the full-pipeline oracle needs:
    ``entity_registry.parquet``, ``popular_entities.parquet``,
    ``family_map.parquet`` (list-typed ``entity_ids``),
    ``known_missing.parquet``.

    The path is keyed by a content fingerprint over every table, so a
    generator change rolls the cache instead of serving stale rows; the
    write is staged to a tmp dir and ``os.rename``d (atomic publish —
    concurrent callers race benignly: one rename wins, losers delete
    their stage).
    """
    import shutil
    import tempfile
    import uuid

    cached = _CORPUS_ROOT_CACHE.get(n_docs)
    if cached is not None and os.path.isdir(cached):
        return cached
    reg = gen_registry()
    bundle = gen_corpus(n_docs, reg)
    docs = bundle.documents.copy()
    docs.insert(0, "doc_id", [
        doc_uid_py(r, p, c)
        for r, p, c in zip(docs["repo"], docs["path"], docs["commit"])
    ])
    cands = bundle.expected_citations.drop(columns=["tier"])
    fam = reg.family_map.copy()
    fam["entity_ids"] = fam["entity_ids"].map(list)
    fp = hashlib.sha256(
        ("\n".join(docs["content_sha256"])
         + "|" + reg.alias_map.to_csv(index=False)
         + "|" + reg.entity_registry.to_csv(index=False)
         + "|" + reg.popular_entities.to_csv(index=False)
         + "|" + fam.to_csv(index=False)
         + "|" + reg.known_missing.to_csv(index=False)
         + "|" + cands.to_csv(index=False) + "|fmt2").encode()
    ).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"kg_corpus_{n_docs}_{fp}")
    if not os.path.isdir(root):
        stage = f"{root}.tmp.{uuid.uuid4().hex[:8]}"
        os.makedirs(stage)
        docs.to_parquet(os.path.join(stage, "documents.parquet"), index=False)
        reg.alias_map.to_parquet(
            os.path.join(stage, "alias_map.parquet"), index=False)
        cands.to_parquet(
            os.path.join(stage, "citation_candidates.parquet"), index=False)
        reg.entity_registry.to_parquet(
            os.path.join(stage, "entity_registry.parquet"), index=False)
        reg.popular_entities.to_parquet(
            os.path.join(stage, "popular_entities.parquet"), index=False)
        fam.to_parquet(os.path.join(stage, "family_map.parquet"), index=False)
        reg.known_missing.to_parquet(
            os.path.join(stage, "known_missing.parquet"), index=False)
        try:
            os.rename(stage, root)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)
            if not os.path.isdir(root):
                raise
    _CORPUS_ROOT_CACHE[n_docs] = root
    return root


def corpus_tables(spark, n_docs: int, reg: RegistryBundle | None = None):
    """Small-scale corpus + registry + goldens as Spark DataFrames."""
    reg = reg or gen_registry()
    bundle = gen_corpus(n_docs, reg)
    out = {
        "documents": spark.createDataFrame(bundle.documents),
        "entity_registry": spark.createDataFrame(reg.entity_registry),
        "popular_entities": spark.createDataFrame(reg.popular_entities),
        "family_map": spark.createDataFrame(reg.family_map),
        "alias_map": spark.createDataFrame(reg.alias_map),
        "known_missing": spark.createDataFrame(reg.known_missing),
        "expected_components": spark.createDataFrame(reg.expected_components),
        "expected_triples": spark.createDataFrame(bundle.expected_triples),
    }
    return out, bundle, reg


_DOC_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "content_sha256 string, doc_ident string, doc_date string, md_length long, "
    "length_category string"
)


def documents_df(spark, n_docs: int, n_partitions: int | None = None):
    """Distributed deterministic corpus for bench scale.

    ``spark.range`` partitions the index space; each worker builds its
    documents purely from the index — no driver-side loop, no collected
    goldens. Scales linearly: at 10^12 files this is just a wider range.
    """
    reg = gen_registry()

    def gen(batches):
        for pdf in batches:
            rows = [build_document(int(i), n_docs, reg)[0] for i in pdf["id"]]
            out = pd.DataFrame(rows)
            yield out[["repo", "path", "commit", "lang", "content", "content_sha256",
                       "doc_ident", "doc_date", "md_length", "length_category"]]

    # 2× defaultParallelism: enough tasks to keep every core busy with
    # mild imbalance, without the fixed 64-task cap that throttled
    # generation above 32 cores (round-3 VERDICT nit)
    if n_partitions is None:
        n_partitions = 2 * spark.sparkContext.defaultParallelism
    return spark.range(n_docs).repartition(n_partitions).mapInPandas(
        gen, schema=_DOC_SCHEMA)
