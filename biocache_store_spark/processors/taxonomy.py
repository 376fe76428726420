"""Taxonomic name matching — the ClassificationProcessor ladder.

Ports the in-repo semantics of processor/ClassificationProcessor.scala and
caches/ClassificationDAO.scala (the deep Lucene matcher lives in the
external ala-name-matching library; its match ladder — exact name, then
canonical genus+epithet, then phonetic, then fuzzy edit-distance within
the genus-stem block, then vernacular, with homonym detection — is
re-implemented here against a names dimension table):

  * hint parsing / conflict checks — ClassificationProcessor.parseHints
    / isMatchValid (ClassificationProcessor.scala:41-78);
  * scientificName construction from higher classification and the
    stray-quote strip — ClassificationDAO.get (ClassificationDAO.scala:28-86);
  * synonym -> accepted resolution with the recursion-limited higher-level
    fallback — ClassificationDAO.scala:146-190 (RECURSIVE_LOOP_LIMIT = 4);
  * subspecies fill for ranks below species (rank id 7000<id<9999) —
    ClassificationDAO.scala:165-169;
  * quality tests (missing rank, name not supplied, unknown kingdom) —
    ClassificationProcessor.doQualityTests (:120-147);
  * assertion + nameMatchMetric emission — ClassificationProcessor.process
    (:152-305). The question/aff/cf regexes declared at :27-29 are unused
    in the reference and are not ported.

Spark shape: the names table is a true dimension (a national backbone is
~1e6 rows — broadcastable and NOT data-scaled), so the ladder is staged
broadcast hash joins, one per tier, resolved JVM-side with pre-aggregated
homonym statistics per key; see `match_names_spark`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from biocache_store_spark.processors.assertions import (
    AssertionCodes as C,
)
from biocache_store_spark.processors.assertions import QualityAssertion as QA

RECURSIVE_LOOP_LIMIT = 4

# rank -> id, the subset the reference uses (species = 7000)
RANK_IDS = {
    "kingdom": 1000,
    "phylum": 2000,
    "class": 3000,
    "order": 4000,
    "family": 5000,
    "genus": 6000,
    "species": 7000,
    "subspecies": 8000,
    "variety": 8010,
}

KINGDOMS = {
    "animalia",
    "plantae",
    "fungi",
    "protista",
    "protozoa",
    "chromista",
    "bacteria",
    "archaea",
    "viruses",
}


def strip_stray_quotes(s: str | None) -> str | None:
    """ClassificationDAO.stripStrayQuotes (ClassificationDAO.scala:28-37)."""
    if s is None:
        return None
    if s.startswith(("'", '"')):
        s = s[1:]
    if s.endswith(("'", '"')):
        s = s[:-1]
    return s


def construct_scientific_name(cl: dict) -> str | None:
    """The scientificName fallback ladder (ClassificationDAO.scala:60-86)."""
    for key in ("subspecies",):
        if cl.get(key):
            return cl[key]
    if cl.get("genus") and cl.get("specificEpithet") and cl.get("infraspecificEpithet"):
        return f"{cl['genus']} {cl['specificEpithet']} {cl['infraspecificEpithet']}"
    if cl.get("genus") and cl.get("specificEpithet"):
        return f"{cl['genus']} {cl['specificEpithet']}"
    # classs BEFORE order mirrors the reference exactly
    # (ClassificationDAO.scala:71-75) — taxonomically odd (class is the
    # coarser rank) but part of the parity contract
    for key in ("species", "genus", "family", "classs", "order", "phylum", "kingdom"):
        if cl.get(key):
            return cl[key]
    return None


def parse_hints(taxon_hints: list[str]) -> dict[str, set[str]]:
    """ClassificationProcessor.parseHints (:41-50): "rank:name" pairs ->
    rank -> lowercased name set."""
    out: dict[str, set[str]] = {}
    for hint in taxon_hints:
        rank, _, name = hint.partition(":")
        # normalize the RANK too: 'Kingdom:Animalia' must hit the same
        # bucket as 'kingdom:animalia' or the scope check silently skips
        out.setdefault(rank.strip().lower(), set()).add(name.strip().lower())
    return out


def is_match_valid(cl: dict, hint_map: dict[str, set[str]]) -> tuple[bool, str]:
    """ClassificationProcessor.isMatchValid (:52-78): False + comment on the
    first hint conflict (kingdom/phylum/class/order/family)."""
    field_of = {
        "kingdom": "kingdom",
        "phylum": "phylum",
        "class": "classs",
        "order": "order",
        "family": "family",
    }
    for rank, allowed in hint_map.items():
        fld = field_of.get(rank)
        if fld is None:
            continue
        taxon = cl.get(fld)
        if taxon is not None and taxon.lower() not in allowed:
            label = "Class" if rank == "class" else rank.capitalize()
            return False, f"{label}:{taxon}"
    return True, ""


_NON_ALPHA = re.compile(r"[^a-z]+")
# latin phonetic folds used by Taxamatch-style matchers: interchangeable
# consonant/vowel groups and gender endings
_PHONETIC_SUBS = [
    (re.compile(r"ae|oe"), "e"),
    # ph->f BEFORE the h-fold: every 'ph' h is letter-preceded, so the
    # [hy]->i rule would consume it first and Phoca/Foca would never
    # share a key — the whole point of this entry
    (re.compile(r"ph"), "f"),
    (re.compile(r"(?<=[a-z])[hy]"), "i"),
    (re.compile(r"^c"), "k"),
    (re.compile(r"(?<=[aeiou])c(?=[ei])"), "s"),
    (re.compile(r"(.)\1+"), r"\1"),
]
_GENDER_ENDING = re.compile(r"(us|um|a|is|e)$")


def phonetic_key(word: str | None) -> str | None:
    """Phonetic normalization of one latin name token (genus or epithet).
    A Taxamatch-inspired fold: lowercase, strip non-alpha, fold the
    interchangeable latin digraphs, collapse doubles, strip the gender
    ending."""
    if not word:
        return None
    w = _NON_ALPHA.sub("", word.lower())
    if not w:
        return None
    for pat, repl in _PHONETIC_SUBS:
        w = pat.sub(repl, w)
    if len(w) > 4:
        w = _GENDER_ENDING.sub("", w)
    return w or None


def normalize_name(name: str | None) -> str | None:
    if not name:
        return None
    return re.sub(r"\s+", " ", name.strip().lower()) or None


# fuzzy-tier budget: levenshtein(genus) + levenshtein(epithet) — the
# Taxamatch/ALANameSearcher edit-distance tolerance for binomials
FUZZY_MAX_DISTANCE = 2


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Plain edit distance with an optional early-exit cap (returns cap+1
    once the distance provably exceeds it)."""
    if a == b:
        return 0
    if cap is not None and abs(len(a) - len(b)) > cap:
        return cap + 1
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        if cap is not None and min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[-1]


@dataclass
class MatchResult:
    result: dict | None
    match_type: str  # exactMatch | canonicalMatch | phoneticMatch |
    #                  vernacularMatch | taxonIdMatch | higherMatch | noMatch
    errors: list[str] = field(default_factory=list)


class NameIndex:
    """In-memory analog of the ALA name index over a names dimension.

    Rows: dicts with lsid, scientificName, taxonRank, rankID, kingdom,
    phylum, classs, order, family, genus, acceptedLsid (set on synonyms),
    lft, rgt, vernacularName (optional), nameType (optional).
    """

    def __init__(self, rows: list[dict]):
        self.by_lsid: dict[str, dict] = {}
        self.by_name: dict[str, list[dict]] = {}
        self.by_canonical: dict[tuple, list[dict]] = {}
        self.by_phonetic: dict[tuple, list[dict]] = {}
        self.by_genus_stem: dict[str, list[tuple]] = {}
        self.by_vernacular: dict[str, list[dict]] = {}
        for row in rows:
            self.by_lsid[row["lsid"]] = row
            key = normalize_name(row.get("scientificName"))
            if key:
                self.by_name.setdefault(key, []).append(row)
                tokens = key.split(" ")
                # canonical/phonetic tiers target binomials: trinomials are
                # excluded so a subspecies never shadows its species on the
                # (genus, epithet) key
                if len(tokens) == 2:
                    self.by_canonical.setdefault(
                        (tokens[0], tokens[1]), []
                    ).append(row)
                    pkey = (phonetic_key(tokens[0]), phonetic_key(tokens[1]))
                    if pkey[0]:
                        self.by_phonetic.setdefault(pkey, []).append(row)
                    # fuzzy tier blocking: 4-char genus stem, the same
                    # block discipline the Spark tier uses
                    self.by_genus_stem.setdefault(tokens[0][:4], []).append(
                        (tokens[0], tokens[1], row)
                    )
                elif len(tokens) == 1:
                    pkey = (phonetic_key(tokens[0]), None)
                    if pkey[0]:
                        self.by_phonetic.setdefault(pkey, []).append(row)
            vern = normalize_name(row.get("vernacularName"))
            if vern:
                self.by_vernacular.setdefault(vern, []).append(row)

    # --- candidate resolution with homonym semantics --------------------
    def _resolve(self, candidates: list[dict], cl: dict) -> tuple[dict | None, bool]:
        """Return (row, is_homonym). Candidates spanning multiple kingdoms
        or ranks are disambiguated by the supplied kingdom / taxonRank
        (the "cross rank homonym resolved" case of TaxonomicNameTest);
        still-ambiguous -> homonym."""
        if not candidates:
            return None, False
        uniq = {c["lsid"]: c for c in candidates}
        candidates = list(uniq.values())
        if len(candidates) == 1:
            return candidates[0], False
        kingdom = (cl.get("kingdom") or "").lower() or None
        if kingdom:
            filtered = [c for c in candidates if (c.get("kingdom") or "").lower() == kingdom]
            if len(filtered) == 1:
                return filtered[0], False
            if filtered:
                candidates = filtered
        rank = (cl.get("taxonRank") or "").lower() or None
        if rank:
            filtered = [c for c in candidates if (c.get("taxonRank") or "").lower() == rank]
            if len(filtered) == 1:
                return filtered[0], False
        return None, True

    def search_by_lsid(self, lsid: str | None) -> dict | None:
        return self.by_lsid.get(lsid) if lsid else None

    def search_common_name(
        self, vernacular: str | None, cl: dict | None = None
    ) -> tuple[dict | None, bool]:
        """(row, is_homonym): ambiguous vernaculars resolve through the
        same kingdom-disambiguation as the name tiers instead of
        returning an arbitrary first row."""
        rows = self.by_vernacular.get(normalize_name(vernacular) or "")
        if not rows:
            return None, False
        return self._resolve(rows, cl or {})

    def search(self, cl: dict, count: int = 0) -> MatchResult:
        """The ClassificationDAO.get ladder over the dimension."""
        cl = dict(cl)
        # attempt 1: id lookup (ClassificationDAO.scala:93-99)
        id_row = self.search_by_lsid(cl.get("taxonConceptID")) or self.search_by_lsid(
            cl.get("taxonID")
        )
        if id_row is not None:
            return self._accepted(id_row, "taxonIdMatch", cl, count)

        if cl.get("scientificName") is None:
            cl["scientificName"] = construct_scientific_name(cl)

        name = normalize_name(strip_stray_quotes(cl.get("scientificName")))
        has_classification = any(
            cl.get(k)
            for k in (
                "scientificName", "specificEpithet", "infraspecificEpithet",
                "kingdom", "phylum", "classs", "order", "family", "genus",
            )
        )
        if has_classification and name:
            # tier 1: exact normalized name
            row, homonym = self._resolve(self.by_name.get(name, []), cl)
            if row is not None:
                return self._accepted(row, "exactMatch", cl, count)
            if homonym:
                return MatchResult(None, "noMatch", ["homonym"])
            # tier 2: canonical genus + epithet
            genus = cl.get("genus")
            epithet = cl.get("specificEpithet")
            if genus and epithet:
                row, homonym = self._resolve(
                    self.by_canonical.get(
                        (genus.strip().lower(), epithet.strip().lower()), []
                    ),
                    cl,
                )
                if row is not None:
                    return self._accepted(row, "canonicalMatch", cl, count)
                if homonym:
                    return MatchResult(None, "noMatch", ["homonym"])
            # tier 3: phonetic
            tokens = name.split(" ")
            pkey = (
                phonetic_key(tokens[0]),
                phonetic_key(tokens[1]) if len(tokens) > 1 else None,
            )
            row, homonym = self._resolve(self.by_phonetic.get(pkey, []), cl)
            if row is not None:
                return self._accepted(row, "phoneticMatch", cl, count)
            if homonym:
                return MatchResult(None, "noMatch", ["homonym"])
            # tier 4: fuzzy — Taxamatch-style edit distance within the
            # 4-char genus-stem block (the effect of the reference's
            # Lucene ALANameSearcher fuzzy matching consumed via
            # ClassificationDAO); min-distance candidates go through the
            # same homonym resolution as the exact tiers
            if len(tokens) == 2:
                scored: list[tuple[int, dict]] = []
                for g, e, row in self.by_genus_stem.get(tokens[0][:4], []):
                    d = levenshtein(tokens[0], g, FUZZY_MAX_DISTANCE)
                    if d <= FUZZY_MAX_DISTANCE:
                        d += levenshtein(
                            tokens[1], e, FUZZY_MAX_DISTANCE - d
                        )
                    if d <= FUZZY_MAX_DISTANCE:
                        scored.append((d, row))
                if scored:
                    dmin = min(d for d, _ in scored)
                    row, homonym = self._resolve(
                        [r for d, r in scored if d == dmin], cl
                    )
                    if row is not None:
                        return self._accepted(row, "fuzzyMatch", cl, count)
                    if homonym:
                        return MatchResult(None, "noMatch", ["homonym"])
        # attempt 3: vernacular last resort (ClassificationDAO.scala:136-143)
        vrow, vhomonym = self.search_common_name(cl.get("vernacularName"), cl)
        if vrow is not None:
            return self._accepted(vrow, "vernacularMatch", cl, count)
        if vhomonym:
            return MatchResult(None, "noMatch", ["homonym"])
        return MatchResult(None, "noMatch")

    def _accepted(self, row: dict, match_type: str, cl: dict, count: int) -> MatchResult:
        """Synonym -> accepted resolution + subspecies fill + recursive
        higher-level fallback (ClassificationDAO.scala:146-190)."""
        if row.get("acceptedLsid"):
            accepted = self.by_lsid.get(row["acceptedLsid"])
            if accepted is None:
                # missing accepted concept: walk up the supplied higher
                # classification (the effect of the reference's recursive
                # re-query with species-level fields stripped,
                # ClassificationDAO.scala:171-185, RECURSIVE_LOOP_LIMIT=4)
                if any(
                    cl.get(k)
                    for k in ("scientificName", "species", "specificEpithet", "infraspecificEpithet")
                ) and count < RECURSIVE_LOOP_LIMIT:
                    sci = row.get("scientificName")
                    for k in ("genus", "family", "order", "classs", "phylum", "kingdom"):
                        value = cl.get(k)
                        if not value or value == sci:
                            continue
                        higher, homonym = self._resolve(
                            self.by_name.get(normalize_name(value), []), cl
                        )
                        if higher is not None:
                            up = self._accepted(higher, "higherMatch", cl, count + 1)
                            up.match_type = "higherMatch"
                            return up
                return MatchResult(None, "noMatch")
            row = accepted
        result = dict(row)
        rank_id = result.get("rankID")
        if rank_id is not None and 7000 < rank_id < 9999:
            result["subspecies"] = result.get("scientificName")
        return MatchResult(result, match_type)


_MATCHED_FIELDS = (
    "scientificName", "taxonConceptID", "taxonRank", "rankID", "kingdom",
    "phylum", "classs", "order", "family", "genus", "vernacularName",
    "lft", "rgt",
)


def process_classification(
    raw: dict,
    index: NameIndex,
    taxon_hints: list[str] | None = None,
    default_values_used: bool = False,
    defaults: dict | None = None,
) -> tuple[dict, list[QA]]:
    """ClassificationProcessor.process (:152-305) over the NameIndex."""
    assertions: list[QA] = []
    processed: dict = {}

    # doQualityTests (:120-147)
    if not (raw.get("taxonRank") or "").strip():
        assertions.append(QA.failed(C.MISSING_TAXONRANK, "Missing taxonRank"))
    else:
        assertions.append(QA.passed(C.MISSING_TAXONRANK))
    if not (raw.get("scientificName") or "").strip() and not (
        raw.get("vernacularName") or ""
    ).strip():
        assertions.append(
            QA.failed(
                C.NAME_NOT_SUPPLIED,
                "No scientificName or vernacularName has been supplied. "
                "Name match will be based on a constructed name.",
            )
        )
    else:
        assertions.append(QA.passed(C.NAME_NOT_SUPPLIED))
    if (raw.get("kingdom") or "").strip():
        if raw["kingdom"].strip().lower() in KINGDOMS:
            assertions.append(QA.passed(C.UNKNOWN_KINGDOM))
        else:
            assertions.append(
                QA.failed(C.UNKNOWN_KINGDOM, "The supplied kingdom is not recognised")
            )

    cl = dict(raw)
    # default-values merge to help homonym disambiguation (:160-178)
    if default_values_used and defaults:
        for k in ("kingdom", "phylum", "classs", "order", "family"):
            if cl.get(k) is None and defaults.get(k) is not None:
                cl[k] = defaults[k]

    match = index.search(cl)
    if match.result is not None:
        assertions.append(QA.passed(C.NAME_NOTRECOGNISED))
        hints_passed = True
        if taxon_hints:
            valid, comment = is_match_valid(match.result, parse_hints(taxon_hints))
            if not valid:
                hints_passed = False
                processed["nameMatchMetric"] = "matchFailedHint"
                assertions.append(
                    QA.failed(C.RESOURCE_TAXONOMIC_SCOPE_MISMATCH, comment)
                )
            else:
                assertions.append(QA.passed(C.RESOURCE_TAXONOMIC_SCOPE_MISMATCH))
        if hints_passed:
            for fld in _MATCHED_FIELDS:
                if fld == "taxonConceptID":
                    processed[fld] = match.result.get("lsid")
                else:
                    processed[fld] = match.result.get(fld)
            processed["nameMatchMetric"] = match.match_type
        processed["taxonomicIssue"] = match.errors or ["noIssue"]
        name_type = match.result.get("nameType", "SCIENTIFIC")
        processed["nameParseType"] = name_type
        if name_type in ("PLACEHOLDER", "NO_NAME"):
            assertions.append(QA.failed(C.INVALID_SCIENTIFIC_NAME))
        else:
            assertions.append(QA.passed(C.INVALID_SCIENTIFIC_NAME))
    elif "homonym" in match.errors:
        processed["nameMatchMetric"] = "noMatch"
        processed["taxonomicIssue"] = match.errors
        assertions.append(
            QA.failed(C.HOMONYM_ISSUE, "A homonym was detected in supplied classification.")
        )
    else:
        processed["nameMatchMetric"] = "noMatch"
        processed["taxonomicIssue"] = ["noIssue"]
        assertions.append(QA.failed(C.NAME_NOTRECOGNISED, "Name not recognised"))
    return processed, assertions


# --- Spark operator ------------------------------------------------------


def match_names_spark(
    records,
    names,
    name_col: str = "scientificName",
    genus_col: str = "genus",
    epithet_col: str = "specificEpithet",
    kingdom_col: str = "kingdom",
    fuzzy_max_distance: int | None = 2,
):
    """Staged broadcast name-match ladder, fully JVM-side.

    Tiers: (1) exact normalized scientificName; (2) canonical
    genus+specificEpithet; (3) fuzzy — Taxamatch-style edit distance over
    binomials, blocked on the 4-char genus stem with
    levenshtein(genus) + levenshtein(epithet) <= fuzzy_max_distance (the
    effect of the reference's Lucene ALANameSearcher fuzzy tier used by
    ClassificationProcessor.scala:152-305; None disables). Homonym keys
    (same name, >1 kingdom in the dimension — for the fuzzy tier, >1
    distinct lsid at the minimal distance) resolve through the record's
    kingdom when supplied and are flagged `homonym` otherwise. Emits
    matched_lsid / matched_scientificName / match_type ('exactMatch' |
    'canonicalMatch' | 'fuzzyMatch' | null) / is_homonym.

    The dimension is aggregated per key before broadcasting, so each tier
    is one broadcast hash join against a key-unique relation — no row
    explosion, no shuffle of the record side; the fuzzy tier's candidate
    lists live inside one array column per stem block (genus-stem blocking
    bounds them the way the dedup operator's blocking keys do), and the
    levenshtein scoring is built-in expressions evaluated lazily only for
    records the earlier tiers missed.

    The record side is fanned out to the session's default parallelism
    first (ensure_min_parallelism, the shingle_df discipline): the ladder
    is a map-only chain of broadcast joins, so its per-row cost — the
    fuzzy tier's interpreted lambda + levenshtein scoring above all —
    lands on however many tasks the SCAN produced, and a small record
    table read as one parquet split ran the whole ladder on ONE core
    (measured r12: 5.8 -> 1.9 s at sf0.1). No-op at real scale where the
    scan has more splits than cores.
    """
    from pyspark.sql import functions as F

    from biocache_store_spark.util import ensure_min_parallelism

    records = ensure_min_parallelism(records)

    def keyed_dim(key_expr):
        per_kingdom = (
            names.select(
                key_expr.alias("__key"),
                F.lower(F.coalesce(F.col("kingdom"), F.lit(""))).alias("__kingdom"),
                "lsid",
                "scientificName",
            )
            .filter(F.col("__key").isNotNull())
            .groupBy("__key", "__kingdom")
            .agg(
                F.count_distinct("lsid").alias("__n_in_kingdom"),
                F.min_by("lsid", "lsid").alias("__k_lsid"),
                F.min_by("scientificName", "lsid").alias("__k_name"),
            )
        )
        return per_kingdom.groupBy("__key").agg(
            F.sum("__n_in_kingdom").alias("__n_candidates"),
            F.min("__k_lsid").alias("__any_lsid"),
            F.min_by("__k_name", "__k_lsid").alias("__any_name"),
            F.map_from_entries(
                F.collect_list(
                    F.when(
                        F.col("__n_in_kingdom") == 1,
                        F.struct(F.col("__kingdom"), F.struct("__k_lsid", "__k_name")),
                    )
                )
            ).alias("__by_kingdom"),
        )

    name_key = F.lower(F.trim(F.col("scientificName")))
    dim1 = keyed_dim(name_key)
    # exactly-two tokens: the NameIndex canonical tier excludes trinomials
    # (a subspecies never shadows its species); >= 2 would bucket
    # 'Abies alba apennina' under 'abies alba' and fake a homonym
    dim2 = keyed_dim(
        F.when(
            F.size(F.split(F.trim(F.col("scientificName")), r"\s+")) == 2,
            F.concat_ws(
                " ",
                F.element_at(F.split(F.lower(F.trim(F.col("scientificName"))), r"\s+"), 1),
                F.element_at(F.split(F.lower(F.trim(F.col("scientificName"))), r"\s+"), 2),
            ),
        )
    )

    rec_kingdom = F.lower(F.coalesce(F.col(kingdom_col), F.lit("")))

    def resolve(prefix):
        """Choose the match for one tier from the aggregated key row.

        The kingdom disambiguation only applies when the record actually
        SUPPLIED a kingdom (NameIndex._resolve semantics): a record with
        no kingdom must see a homonym flag, not silently resolve through
        the dimension's null-kingdom bucket (which shares the '' key)."""
        by_k = F.col(f"{prefix}__by_kingdom")
        n = F.col(f"{prefix}__n_candidates")
        kingdom_hit = F.element_at(by_k, rec_kingdom)
        return (
            F.when(n == 1, F.struct(F.col(f"{prefix}__any_lsid").alias("lsid"),
                                    F.col(f"{prefix}__any_name").alias("name"),
                                    F.lit(False).alias("homonym")))
            .when(
                (n > 1) & (rec_kingdom != "") & kingdom_hit.isNotNull(),
                F.struct(
                    kingdom_hit.getField("__k_lsid").alias("lsid"),
                    kingdom_hit.getField("__k_name").alias("name"),
                    F.lit(False).alias("homonym"),
                ),
            )
            .when(
                n > 1,
                F.struct(
                    F.lit(None).cast("string").alias("lsid"),
                    F.lit(None).cast("string").alias("name"),
                    F.lit(True).alias("homonym"),
                ),
            )
        )

    rec_name_key = F.lower(F.trim(F.col(name_col)))
    rec_canonical_key = F.when(
        F.col(genus_col).isNotNull() & F.col(epithet_col).isNotNull(),
        F.lower(F.concat_ws(" ", F.trim(F.col(genus_col)), F.trim(F.col(epithet_col)))),
    )

    d1 = dim1.select(
        F.col("__key").alias("__key1"),
        *[F.col(c).alias(f"__t1{c}") for c in dim1.columns if c != "__key"],
    )
    d2 = dim2.select(
        F.col("__key").alias("__key2"),
        *[F.col(c).alias(f"__t2{c}") for c in dim2.columns if c != "__key"],
    )
    out = (
        records.join(F.broadcast(d1), rec_name_key == F.col("__key1"), "left")
        .join(F.broadcast(d2), rec_canonical_key == F.col("__key2"), "left")
    )

    # tier 3: fuzzy within the genus-stem block. The dimension is one row
    # per stem carrying all binomials as an array (collect_list after the
    # same per-(name,kingdom) uniquing the exact tiers use), so the join
    # is a broadcast hash join with zero row multiplication; scoring and
    # the min-distance pick are array expressions over the block.
    if fuzzy_max_distance is not None:
        nm_toks = F.split(F.lower(F.trim(F.col("scientificName"))), r"\s+")
        binom = (
            names.select(
                nm_toks.alias("__toks"),
                F.lower(F.coalesce(F.col("kingdom"), F.lit(""))).alias("__kingdom"),
                "lsid",
                "scientificName",
            )
            .filter(F.size("__toks") == 2)
            .select(
                F.element_at("__toks", 1).alias("__g"),
                F.element_at("__toks", 2).alias("__e"),
                "__kingdom",
                "lsid",
                "scientificName",
            )
            .groupBy("__g", "__e", "__kingdom")
            .agg(
                F.min_by("lsid", "lsid").alias("__lsid"),
                F.min_by("scientificName", "lsid").alias("__name"),
                # distinct lsids sharing this (name, kingdom): >1 means an
                # in-kingdom homonym no hint can resolve — the same
                # __n_in_kingdom discipline the exact tiers keep, which a
                # bare min_by collapse would silently hide
                F.count_distinct("lsid").alias("__nl"),
            )
        )
        d3 = binom.groupBy(F.substring("__g", 1, 4).alias("__key3")).agg(
            F.collect_list(
                F.struct("__g", "__e", "__kingdom", "__lsid", "__name", "__nl")
            ).alias("__t3cands")
        )
        rec_toks = F.split(rec_name_key, r"\s+")
        two_tok = F.size(rec_toks) == 2
        rec_g = F.coalesce(
            F.lower(F.trim(F.col(genus_col))),
            F.when(two_tok, F.element_at(rec_toks, 1)),
        )
        rec_e = F.coalesce(
            F.lower(F.trim(F.col(epithet_col))),
            F.when(two_tok, F.element_at(rec_toks, 2)),
        )
        out = out.withColumn("__recg", rec_g).withColumn("__rece", rec_e)
        fkey = F.when(
            F.col("__recg").isNotNull() & F.col("__rece").isNotNull(),
            F.substring(F.col("__recg"), 1, 4),
        )
        out = out.join(F.broadcast(d3), fkey == F.col("__key3"), "left")
        # distance-scored candidates; named columns so codegen CSE shares
        # the levenshtein work across the downstream expressions
        out = out.withColumn(
            "__t3valid",
            F.filter(
                F.transform(
                    F.col("__t3cands"),
                    lambda c: F.struct(
                        (
                            F.levenshtein(c["__g"], F.col("__recg"))
                            + F.levenshtein(c["__e"], F.col("__rece"))
                        ).alias("d"),
                        c["__lsid"].alias("lsid"),
                        c["__name"].alias("name"),
                        c["__kingdom"].alias("kingdom"),
                        c["__nl"].alias("nl"),
                    ),
                ),
                lambda s: s["d"] <= F.lit(int(fuzzy_max_distance)),
            ),
        )
        out = out.withColumn("__t3best", F.array_min("__t3valid"))
        best = F.col("__t3best")
        best_set = F.filter(
            F.col("__t3valid"), lambda s: s["d"] == best["d"]
        )
        best_lsids = F.array_distinct(
            F.transform(best_set, lambda s: s["lsid"])
        )
        k_set = F.filter(best_set, lambda s: s["kingdom"] == rec_kingdom)
        k_best = F.array_min(k_set)
        k_lsids = F.array_distinct(F.transform(k_set, lambda s: s["lsid"]))
        # a candidate row carrying an in-kingdom homonym (nl > 1) can
        # never be a confident match: its min_by lsid hides siblings
        no_hidden = F.size(F.filter(best_set, lambda s: s["nl"] > 1)) == 0
        k_no_hidden = F.size(F.filter(k_set, lambda s: s["nl"] > 1)) == 0
        t3 = F.when(
            best.isNotNull(),
            F.when(
                (F.size(best_lsids) == 1) & no_hidden,
                F.struct(
                    best["lsid"].alias("lsid"),
                    best["name"].alias("name"),
                    F.lit(False).alias("homonym"),
                ),
            )
            .when(
                (rec_kingdom != "") & (F.size(k_lsids) == 1) & k_no_hidden,
                F.struct(
                    k_best["lsid"].alias("lsid"),
                    k_best["name"].alias("name"),
                    F.lit(False).alias("homonym"),
                ),
            )
            .otherwise(
                F.struct(
                    F.lit(None).cast("string").alias("lsid"),
                    F.lit(None).cast("string").alias("name"),
                    F.lit(True).alias("homonym"),
                ),
            ),
        )
        t3_cleanup = ("__recg", "__rece", "__key3", "__t3cands", "__t3valid", "__t3best")
    else:
        t3 = None
        t3_cleanup = ()

    t1 = resolve("__t1")
    t2 = resolve("__t2")
    chosen = F.coalesce(t1, t2, t3) if t3 is not None else F.coalesce(t1, t2)
    match_type = (
        F.when(t1.isNotNull() & ~t1.getField("homonym"), F.lit("exactMatch"))
        .when(
            t1.isNull() & t2.isNotNull() & ~t2.getField("homonym"),
            F.lit("canonicalMatch"),
        )
    )
    if t3 is not None:
        match_type = match_type.when(
            t1.isNull() & t2.isNull() & t3.isNotNull() & ~t3.getField("homonym"),
            F.lit("fuzzyMatch"),
        )
    out = (
        out.withColumn("__chosen", chosen)
        .withColumn("match_type", match_type)
        .withColumn("matched_lsid", F.col("__chosen").getField("lsid"))
        .withColumn("matched_scientificName", F.col("__chosen").getField("name"))
        .withColumn(
            "is_homonym", F.coalesce(F.col("__chosen").getField("homonym"), F.lit(False))
        )
        .drop("__chosen", "__key1", "__key2", *t3_cleanup)
    )
    return out.drop(*[c for c in out.columns if c.startswith("__t1") or c.startswith("__t2")])
