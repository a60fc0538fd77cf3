"""Deterministic fixture ontology (FIXTURES.md §2).

RDF/XML in the exact element shape of the reference's committed fixture
(/root/reference/sample_ontology.owl:1-47): ``owl:Class`` with
``rdfs:label``, ``rdfs:subClassOf``, SKOS annotations — scaled to ~60
legal-flavored classes under 4 top branches, with alias labels, a
sandbox-excluded class (P2), and an "Analytics Operation" branch whose
labels intentionally overlap the vocabulary of the driver-provided
``documents`` test table so the flagship entry query links real mentions.
"""

from __future__ import annotations

from pathlib import Path

BASE = "http://lmss.example.org/fixture#"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"

# (local_id, label, parent_local_id or None for top-level, [alt labels])
FIXTURE_CLASSES: list[tuple[str, str, str | None, list[str]]] = [
    # --- branch: Area of Law ------------------------------------------------
    ("AreaOfLaw", "Area of Law", None, ["legal field"]),
    ("IPLaw", "Intellectual Property Law", "AreaOfLaw", ["IP law"]),
    ("PatentLaw", "Patent Law", "IPLaw", ["law of patents"]),
    ("CopyrightLaw", "Copyright Law", "IPLaw", ["copyright infringement"]),
    ("TrademarkLaw", "Trademark Law", "IPLaw", ["trademark disputes", "trademark dispute"]),
    ("TradeSecretLaw", "Trade Secret Law", "IPLaw", ["trade secret litigation"]),
    ("SoftwareLicensing", "Software Licensing", "IPLaw", ["software license law"]),
    ("OpenSourceCompliance", "Open Source Compliance", "SoftwareLicensing", ["open source compliance"]),
    ("ContractLaw", "Contract Law", "AreaOfLaw", ["law of contracts"]),
    ("TaxLaw", "Tax Law", "AreaOfLaw", ["taxation law"]),
    ("EmploymentLaw", "Employment Law", "AreaOfLaw", ["labor law"]),
    ("CriminalLaw", "Criminal Law", "AreaOfLaw", []),
    ("Litigation", "Litigation", "AreaOfLaw", ["civil litigation"]),
    ("Bankruptcy", "Bankruptcy Law", "AreaOfLaw", ["insolvency law"]),
    ("EnvironmentalLaw", "Environmental Law", "AreaOfLaw", []),
    ("AntitrustLaw", "Antitrust Law", "AreaOfLaw", ["competition law"]),
    ("SecuritiesLaw", "Securities Law", "AreaOfLaw", []),
    ("RealEstateLaw", "Real Estate Law", "AreaOfLaw", ["property law"]),
    ("FamilyLaw", "Family Law", "AreaOfLaw", []),
    ("ImmigrationLaw", "Immigration Law", "AreaOfLaw", []),
    ("DataPrivacyLaw", "Data Privacy Law", "AreaOfLaw", ["privacy law", "data protection law"]),
    # --- branch: Location ---------------------------------------------------
    ("Location", "Location", None, ["place"]),
    ("UnitedStates", "United States", "Location", ["USA", "United States of America"]),
    ("Texas", "Texas", "UnitedStates", []),
    ("ParisTexas", "Paris, Texas", "Texas", ["Paris Texas"]),
    ("California", "California", "UnitedStates", []),
    ("NewYork", "New York", "UnitedStates", ["NYC"]),
    ("Delaware", "Delaware", "UnitedStates", []),
    ("France", "France", "Location", []),
    ("ParisFrance", "Paris", "France", ["Paris, France"]),
    ("Germany", "Germany", "Location", []),
    ("London", "London", "Location", []),
    # --- branch: Actor / Player --------------------------------------------
    ("ActorPlayer", "Actor / Player", None, ["participant"]),
    ("Lawyer", "Lawyer", "ActorPlayer", ["attorney", "counsel"]),
    ("IPLawyer", "Intellectual Property Lawyer", "Lawyer", ["IP lawyer", "patent attorney"]),
    ("JudgeActor", "Judge", "ActorPlayer", []),
    ("Paralegal", "Paralegal", "ActorPlayer", []),
    ("Client", "Client", "ActorPlayer", []),
    ("LawFirm", "Law Firm", "ActorPlayer", ["legal practice"]),
    ("Court", "Court", "ActorPlayer", ["tribunal"]),
    ("AppealsCourt", "Court of Appeals", "Court", ["appellate court"]),
    ("SupremeCourt", "Supreme Court", "Court", []),
    ("Plaintiff", "Plaintiff", "ActorPlayer", ["complainant"]),
    ("Defendant", "Defendant", "ActorPlayer", []),
    ("ExpertWitness", "Expert Witness", "ActorPlayer", []),
    # --- branch: Analytics Operation (overlaps documents-table vocabulary) --
    ("AnalyticsOp", "Analytics Operation", None, ["data operation"]),
    ("HashJoin", "Hash Join", "AnalyticsOp", ["hash join"]),
    ("MergeSort", "Merge Sort", "AnalyticsOp", ["sort merge"]),
    ("TableScan", "Table Scan", "AnalyticsOp", ["full scan"]),
    ("IndexScan", "Index Scan", "AnalyticsOp", []),
    ("WindowFunction", "Window Function", "AnalyticsOp", ["window frame"]),
    ("StreamProcessing", "Stream Processing", "AnalyticsOp", ["stream batch"]),
    ("BatchProcessing", "Batch Processing", "AnalyticsOp", ["batch job"]),
    ("SparkEngine", "Spark Engine", "AnalyticsOp", ["spark runtime"]),
    ("KeyOrder", "Key Order", "AnalyticsOp", ["order key"]),
    ("HashPartition", "Hash Partition", "HashJoin", ["partition hash"]),
    ("DupFilter", "Duplicate Filter", "AnalyticsOp", ["dup filter"]),
    # --- sandbox-excluded class (exercises P2) ------------------------------
    ("SandboxClass", "ZZZ - SANDBOX: UNDER CONSTRUCTION sandbox item", "AreaOfLaw", []),
    # --- class with no subClassOf at all (branch -> Unknown) ----------------
    ("OrphanConcept", "Orphan Concept", "__NONE__", ["stray notion"]),
]


def _class_xml(local: str, label: str, parent: str | None, alts: list[str]) -> str:
    lines = [f'    <owl:Class rdf:about="{BASE}{local}">']
    lines.append(f"        <rdfs:label>{label}</rdfs:label>")
    if parent == "__NONE__":
        pass  # no subClassOf edge at all
    elif parent is None:
        lines.append(f'        <rdfs:subClassOf rdf:resource="{OWL_THING}"/>')
    else:
        lines.append(f'        <rdfs:subClassOf rdf:resource="{BASE}{parent}"/>')
    for alt in alts:
        lines.append(f"        <skos:altLabel>{alt}</skos:altLabel>")
    # Every class carries definition + prefLabel except a deterministic
    # subset, so some classes have exactly one embedded field (their
    # rdfs_label) — making the cosine-1.0 fast path reachable for exact
    # label mentions (J2 coverage).
    label_only = sum(ord(c) for c in local) % 3 == 0
    if not label_only:
        lines.append(f"        <skos:definition>Definition of {label} in the fixture ontology.</skos:definition>")
        lines.append(f"        <skos:prefLabel>{label}</skos:prefLabel>")
        lines.append(f"        <skos:example>Example usage of {label}.</skos:example>")
    lines.append("    </owl:Class>")
    return "\n".join(lines)


def fixture_owl_xml() -> str:
    body = "\n\n".join(_class_xml(*row) for row in FIXTURE_CLASSES)
    return f"""<?xml version="1.0"?>
<rdf:RDF xmlns="{BASE}"
     xml:base="{BASE.rstrip('#')}"
     xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
     xmlns:owl="http://www.w3.org/2002/07/owl#"
     xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
     xmlns:skos="http://www.w3.org/2004/02/skos/core#"
     xmlns:dc="http://purl.org/dc/elements/1.1/"
     xmlns:xsd="http://www.w3.org/2001/XMLSchema#">
    <owl:Ontology rdf:about="{BASE.rstrip('#')}"/>

{body}
</rdf:RDF>
"""


def write_fixture_owl(path: str | Path) -> Path:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(fixture_owl_xml())
    return p
