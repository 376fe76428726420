"""Vocabulary matching: normalize → canonical/variant/stem lookup.

Port of vocab/Vocab.scala:51-80: input is stripped of non-alphanumerics and
lower-cased, then matched against each term's canonical form
(case-insensitive) and its normalized variants, with a Porter-stemmed
fallback. Divergence (documented): we also compare stemmed input against
stemmed variants, which covers plurals without requiring pre-stemmed entries
in the vocab data files.

Vocab data here is authored for this engine from the public Darwin Core
recommended vocabularies — not copied from the reference resource files.
External tab-separated files in the same shape (first column canonical,
rest variants) can be loaded with Vocab.from_file.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from biocache_store_spark.parsers.stemmer import stem

_NORM = re.compile(r"[^a-zA-Z0-9]+")


def normalize(s: str) -> str:
    return _NORM.sub("", s).lower()


@dataclass(frozen=True)
class Term:
    canonical: str
    variants: tuple[str, ...] = field(default_factory=tuple)


class Vocab:
    def __init__(self, terms: list[Term]):
        self.all = terms
        self._by_variant: dict[str, Term] = {}
        self._by_stem: dict[str, Term] = {}
        # raw-string -> Term memo: the chain calls match_term per record and
        # real-world vocab inputs are massively repetitive (the reference
        # fronts every vocabulary with an LRU — caches/*DAO.scala)
        self._match_cache: dict[str | None, Term | None] = {}
        for t in terms:
            for v in (normalize(t.canonical), *t.variants):
                self._by_variant.setdefault(v, t)
                self._by_stem.setdefault(stem(v), t)

    @classmethod
    def of(cls, mapping: dict[str, list[str]]) -> "Vocab":
        return cls(
            [
                Term(canonical, tuple(normalize(v) for v in (canonical, *variants)))
                for canonical, variants in mapping.items()
            ]
        )

    @classmethod
    def from_file(cls, path: str) -> "Vocab":
        """Tab-separated rows: canonical<TAB>variant<TAB>... (Vocab.scala:119)."""
        terms = []
        with open(path, encoding="utf-8") as fh:
            for row in fh:
                row = row.rstrip("\n")
                if not row:
                    continue
                values = row.split("\t")
                variants = tuple(
                    v for v in (normalize(x) for x in values) if v
                )
                terms.append(Term(values[0], variants))
        return cls(terms)

    def match_term(self, s: str | None) -> Term | None:
        if s is None:
            return None
        if s in self._match_cache:
            return self._match_cache[s]
        key = normalize(s)
        if not key:
            t = None
        else:
            t = self._by_variant.get(key)
            if t is None:
                t = self._by_stem.get(stem(key))
        if len(self._match_cache) < 100_000:
            self._match_cache[s] = t
        return t

    def canonical(self, s: str | None) -> str | None:
        t = self.match_term(s)
        return t.canonical if t else None


# --- built-in vocabularies (Darwin Core recommended values + common variants)

BASIS_OF_RECORD = Vocab.of(
    {
        "PreservedSpecimen": [
            "preserved specimen", "preserved_specimen", "specimen", "speci", "s",
            "spec", "conserved specimen",
        ],
        "FossilSpecimen": ["fossil", "fossil specimen", "fossilised specimen", "f"],
        "LivingSpecimen": ["living specimen", "live specimen", "l"],
        "HumanObservation": [
            "human observation", "observation", "obs", "o", "sighting",
            "field observation",
        ],
        "MachineObservation": ["machine observation", "machine", "m"],
        "MaterialSample": ["material sample", "tissue sample", "dna sample"],
        "MaterialCitation": ["material citation", "publication"],
        # canonicals from the reference's basisOfRecord.txt
        "Image": ["i", "img", "jpg", "png", "still image", "stillimage"],
        "Literature": [
            "literature", "literaturerecord", "published report",
            "unpublished report",
        ],
        "Sound": ["snd", "digitisedtrack", "digitizedtrack", "track", "wav"],
        "Video": ["mov", "mp4", "mpg", "avi", "v", "vid", "video recording"],
        "Germplasm": ["germplasm/seed"],
        "NomenclaturalChecklist": ["names checklist"],
        "RegionalChecklist": ["checklist"],
        "GenomicDNA": ["genomic dna"],
        "EnvironmentalDNA": ["edna", "environmental dna", "environmentaldna"],
        "Occurrence": ["occurrence", "occurrence record"],
        "Event": ["event"],
        "Taxon": ["taxon"],
    }
)

OCCURRENCE_STATUS = Vocab.of(
    {
        "present": ["present", "presence", "p", "common", "rare", "irregular"],
        "absent": ["absent", "absence", "a", "not recorded"],
    }
)

TYPE_STATUS = Vocab.of(
    {
        "holotype": ["holo type", "holotypus"],
        "isotype": ["iso type"],
        "paratype": ["para type"],
        "syntype": ["syn type"],
        "lectotype": ["lecto type"],
        "neotype": ["neo type"],
        "topotype": ["topo type"],
        "allotype": ["allo type"],
        "cotype": ["co type"],
        "paralectotype": ["para lectotype"],
        "hapantotype": [],
        "type": ["type specimen"],
        "notatype": ["not a type"],
    }
)

SEX = Vocab.of(
    {
        "male": ["m", "males"],
        "female": ["f", "females"],
        "hermaphrodite": [],
        "indeterminate": ["undetermined", "unknown sex"],
    }
)

LIFE_STAGE = Vocab.of(
    {
        "adult": ["ad", "adults", "mature"],
        "juvenile": ["juv", "immature", "young"],
        "larva": ["larvae", "tadpole", "caterpillar"],
        "egg": ["eggs", "ova"],
        "pupa": ["pupae"],
        "seedling": [],
        "flowering": ["in flower"],
        "fruiting": ["in fruit"],
    }
)

ESTABLISHMENT_MEANS = Vocab.of(
    {
        "native": ["indigenous", "endemic"],
        "introduced": ["alien", "exotic", "non-native", "naturalised"],
        "managed": ["cultivated", "captive", "cultivated escapee"],
        "uncertain": ["unknown", "doubtful"],
    }
)

# mirrors the reference's datePrecision.txt exactly (canonical + variants;
# case folds through normalize, so 'day'/'YEAR' still match the canonicals)
DATE_PRECISION = Vocab.of(
    {
        "Day": ["d"],
        "Day Range": ["dd"],
        "Year": ["y", "yr"],
        "Year Range": ["yy"],
        "Month Range": ["oo"],
        "Month": ["o", "m", "mon", "mnth"],
    }
)
