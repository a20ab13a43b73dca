"""NCBI taxonomy fetch tool with canned Entrez XML responses (network-gated
in production; reference get_all_species_taxo_labels_dict_and_save_to_json.py)."""

import json

from clibd_tpu.data.ncbi import (
    fetch_species_taxonomy_json,
    get_species_to_other_level_dict,
    parse_esearch_ids,
    parse_lineage_ranks,
)

ESEARCH_XML = b"""<?xml version="1.0"?>
<eSearchResult><Count>1</Count><IdList><Id>27457</Id></IdList></eSearchResult>"""

ESEARCH_EMPTY = b"""<?xml version="1.0"?>
<eSearchResult><Count>0</Count><IdList></IdList></eSearchResult>"""

EFETCH_XML = b"""<?xml version="1.0"?>
<TaxaSet><Taxon>
  <TaxId>27457</TaxId><ScientificName>Bradysia impatiens</ScientificName>
  <LineageEx>
    <Taxon><TaxId>1</TaxId><ScientificName>Insecta</ScientificName><Rank>class</Rank></Taxon>
    <Taxon><TaxId>2</TaxId><ScientificName>Diptera</ScientificName><Rank>order</Rank></Taxon>
    <Taxon><TaxId>3</TaxId><ScientificName>Sciaridae</ScientificName><Rank>family</Rank></Taxon>
    <Taxon><TaxId>4</TaxId><ScientificName>Bradysia</ScientificName><Rank>genus</Rank></Taxon>
  </LineageEx>
</Taxon></TaxaSet>"""


def canned_fetch(url: str) -> bytes:
    if "esearch" in url:
        return ESEARCH_EMPTY if "Unknownus" in url else ESEARCH_XML
    if "efetch" in url:
        return EFETCH_XML
    raise AssertionError(url)


def test_parsers():
    assert parse_esearch_ids(ESEARCH_XML) == ["27457"]
    assert parse_esearch_ids(ESEARCH_EMPTY) == []
    assert parse_lineage_ranks(EFETCH_XML) == {
        "order": "Diptera", "family": "Sciaridae", "genus": "Bradysia"}


def test_lookup_with_canned_responses():
    info, failed = get_species_to_other_level_dict(
        ["Bradysia impatiens", "Unknownus speciesus"], email="x@y.z",
        fetch=canned_fetch, sleep_s=0)
    assert info["Bradysia impatiens"]["order"] == "Diptera"
    assert info["Unknownus speciesus"] == {
        "order": "not_classified", "family": "not_classified",
        "genus": "not_classified"}
    assert failed == []


def test_network_error_degrades_to_not_classified():
    def broken(url):
        raise OSError("no network")

    info, failed = get_species_to_other_level_dict(
        ["Bradysia impatiens"], email="x@y.z", fetch=broken, sleep_s=0)
    assert info["Bradysia impatiens"]["genus"] == "not_classified"
    assert failed == ["Bradysia impatiens"]


def test_resume_from_existing_json(tmp_path):
    out = tmp_path / "taxo.json"
    with open(out, "w") as f:
        json.dump({"Already done": {"order": "O", "family": "F", "genus": "G"}}, f)
    calls = []

    def counting_fetch(url):
        calls.append(url)
        return canned_fetch(url)

    info = fetch_species_taxonomy_json(
        ["Already done", "Bradysia impatiens"], str(out), email="x@y.z",
        fetch=counting_fetch, sleep_s=0, progress=False)
    assert info["Already done"]["order"] == "O"  # not re-fetched
    assert len(calls) == 2  # esearch+efetch for the one new species only
    with open(out) as f:
        assert set(json.load(f)) == {"Already done", "Bradysia impatiens"}
