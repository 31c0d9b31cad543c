"""Behavioral parity with the reference name-variant semantics.

Cases mirror /root/reference/tests/test_name_variants.py and
tests/test_canonical_name.py (assertions re-derived, not copied).
"""

from hinbox_spark.config import DEFAULT_EQUIVALENCE_GROUPS
from hinbox_spark.functions.names import (
    acronym_matches,
    cluster_canonical_score,
    compute_acronym,
    expand_equivalents,
    is_acronym_form,
    is_low_quality_name,
    is_name_contained,
    names_likely_same,
    normalize_display,
    normalize_for_match,
    pick_canonical,
    score_canonical_name,
    strip_leading_article,
)

ORG_GROUPS = DEFAULT_EQUIVALENCE_GROUPS["organizations"]
LOC_GROUPS = DEFAULT_EQUIVALENCE_GROUPS["locations"]


class TestNormalize:
    def test_display(self):
        assert normalize_display("  hello  ") == "hello"
        assert normalize_display("Department   of   Defense") == "Department of Defense"
        assert normalize_display(None) == ""
        assert normalize_display("") == ""

    def test_match(self):
        assert normalize_for_match("FBI") == "fbi"
        assert normalize_for_match("U.S. Army") == "u s army"
        assert normalize_for_match("Department—of–Defense") == "department of defense"


class TestAcronyms:
    def test_is_acronym_form(self):
        for s in ("FBI", "ICE", "CIA", "NSA", "U.N.", "U.S.", "DoD", "DoJ"):
            assert is_acronym_form(s), s
        for s in ("Department of Defense", "Navy", "immigration", "A",
                  "ABCDEFGHIJK", ""):
            assert not is_acronym_form(s), s

    def test_compute_acronym(self):
        assert compute_acronym("Immigration and Customs Enforcement") == "ICE"
        assert compute_acronym("Federal Bureau of Investigation") == "FBI"
        assert compute_acronym("Department of Homeland Security") == "DHS"
        # documented reference quirk: stopword 'of' dropped → "DD"
        assert compute_acronym("Department of Defense") == "DD"
        assert compute_acronym("American Civil Liberties Union") == "ACLU"
        assert compute_acronym("Pentagon") is None
        assert compute_acronym("the and of") is None
        assert compute_acronym("Coast Guard") == "CG"

    def test_acronym_matches(self):
        assert acronym_matches("ICE", "Immigration and Customs Enforcement")
        assert acronym_matches("FBI", "Federal Bureau of Investigation")
        assert acronym_matches("DHS", "Department of Homeland Security")
        assert not acronym_matches("FBI", "Immigration and Customs Enforcement")
        assert not acronym_matches("Navy", "Department of the Navy")
        # lowercase 'ice' is not acronym form
        assert not acronym_matches("ice", "Immigration and Customs Enforcement")


class TestContainment:
    def test_contained(self):
        assert is_name_contained("Homeland Security", "Department of Homeland Security")
        assert is_name_contained("Navy", "Navy")
        assert is_name_contained("Army", "US Army Command")

    def test_not_contained(self):
        assert not is_name_contained("Coast Guard", "Navy")
        assert not is_name_contained("US", "US Army")  # too short
        assert not is_name_contained("ice", "Internal Revenue Service")


class TestEquivalence:
    def test_expand(self):
        result = expand_equivalents("DoD", ORG_GROUPS)
        assert {"Department of Defense", "DoD", "Pentagon"} <= result

    def test_no_group(self):
        assert expand_equivalents("FBI", []) == {"FBI"}


class TestNamesLikelySame:
    def test_exact(self):
        assert names_likely_same("FBI", "FBI")
        assert names_likely_same("U.S.  Army", "U S Army")  # punct+ws normalize

    def test_acronym(self):
        assert names_likely_same("ICE", "Immigration and Customs Enforcement")

    def test_containment(self):
        assert names_likely_same(
            "Homeland Security", "Department of Homeland Security"
        )

    def test_equivalence_group(self):
        assert names_likely_same(
            "Pentagon", "Department of Defense", equivalence_groups=ORG_GROUPS
        )

    def test_people_conservative(self):
        # containment does NOT merge people
        assert not names_likely_same(
            "John Smith", "John Smith Jr. Senior Analyst John Smith",
            entity_type="people",
        )
        assert names_likely_same("John Smith", "john  smith", entity_type="people")

    def test_different(self):
        assert not names_likely_same("FBI", "CIA")


class TestLowQuality:
    def test_generic_plural_head(self):
        assert is_low_quality_name("Defense departments")
        assert is_low_quality_name("security agencies")

    def test_descriptive_location(self):
        assert is_low_quality_name("military base in Cuba")
        assert is_low_quality_name("U.S. military base in Guantánamo Bay")

    def test_proper_names_ok(self):
        assert not is_low_quality_name("Department of Defense")
        assert not is_low_quality_name("Guantanamo Bay")
        assert not is_low_quality_name("")


class TestCanonicalScore:
    def test_longer_scores_higher(self):
        assert score_canonical_name("Department of Homeland Security") > \
            score_canonical_name("DHS")

    def test_acronym_negative(self):
        assert score_canonical_name("ICE") < 0

    def test_contextual_suffix_negative(self):
        assert score_canonical_name("U.S. soil") < 0
        for suffix in ("soil", "territory", "waters", "border", "grounds",
                       "arena", "area"):
            assert score_canonical_name(f"Cuban {suffix}") < \
                score_canonical_name("Cuban Ministry")

    def test_empty_zero(self):
        assert score_canonical_name("") == 0.0

    def test_strip_leading_article(self):
        assert strip_leading_article("the Pentagon") == "Pentagon"
        assert strip_leading_article("The New York Times") == "New York Times"


class TestPickCanonical:
    def test_us_soil_vs_united_states(self):
        canonical, demoted, swapped = pick_canonical("U.S. soil", "United States")
        assert swapped and canonical == "United States" and demoted == "U.S. soil"

    def test_ice_vs_full_name(self):
        canonical, _, swapped = pick_canonical(
            "ICE", "Immigration and Customs Enforcement"
        )
        assert swapped and canonical == "Immigration and Customs Enforcement"

    def test_pentagon_stays(self):
        canonical, _, swapped = pick_canonical("Pentagon", "Department of Defense")
        assert not swapped and canonical == "Pentagon"

    def test_containment_bonus(self):
        canonical, _, swapped = pick_canonical("Defense", "Department of Defense")
        assert swapped and canonical == "Department of Defense"

    def test_dhs_swaps(self):
        canonical, _, swapped = pick_canonical(
            "DHS", "Department of Homeland Security"
        )
        assert swapped and canonical == "Department of Homeland Security"

    def test_guantanamo_bay_keeps(self):
        canonical, _, swapped = pick_canonical("Guantanamo Bay", "Guantanamo")
        assert not swapped and canonical == "Guantanamo Bay"

    def test_identical_no_swap(self):
        canonical, _, swapped = pick_canonical("FBI", "fbi")
        assert not swapped and canonical == "FBI"

    def test_people_full_name(self):
        canonical, _, swapped = pick_canonical("Mohammed", "Mohammed Al-Qahtani")
        assert swapped and canonical == "Mohammed Al-Qahtani"


class TestClusterCanonicalScore:
    def test_full_form_beats_acronym_in_cluster(self):
        members = ["ICE", "Immigration and Customs Enforcement"]
        scores = {m: cluster_canonical_score(m, members) for m in members}
        assert scores["Immigration and Customs Enforcement"] > scores["ICE"]

    def test_complete_name_wins(self):
        members = ["Homeland Security", "Department of Homeland Security"]
        scores = {m: cluster_canonical_score(m, members) for m in members}
        assert scores["Department of Homeland Security"] > scores["Homeland Security"]
