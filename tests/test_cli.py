"""CLI commands (bin/ analogues): validate + sparql (d2r-query)."""

import tempfile

from ont_d2rq_spark.cli import main
from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.mapping.serialize import to_ttl

SF = "/root/testdata/sf0.001"


def _mapping_file() -> str:
    ttl = to_ttl(tpch_mapping(SF))
    f = tempfile.NamedTemporaryFile(mode="w", suffix=".ttl", delete=False)
    f.write(ttl)
    f.close()
    return f.name


def test_cli_validate(capsys):
    path = _mapping_file()
    assert main(["validate", "-m", path, "-d", SF]) == 0
    assert "class maps" in capsys.readouterr().out


def test_cli_owl(capsys):
    path = _mapping_file()
    assert main(["owl", "-m", path, "-d", SF]) == 0
    out = capsys.readouterr().out
    assert "Ontology(<" in out
    assert "Declaration(Class(<http://example.org/Customer>))" in out


def test_cli_sparql(spark, capsys):
    path = _mapping_file()
    rc = main(
        [
            "sparql",
            "-m",
            path,
            "-d",
            SF,
            "-q",
            """PREFIX ex: <http://example.org/>
               SELECT ?name (COUNT(*) AS ?n) WHERE {
                   ?c ex:inNation ?nn . ?nn ex:name ?name .
               } GROUP BY ?name ORDER BY ?name LIMIT 3""",
            "--limit",
            "5",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.strip().splitlines() if l]
    assert lines[0].split("\t") == ["name", "n"]
    assert len(lines) == 4  # header + 3 rows
    assert all(int(l.split("\t")[1]) > 0 for l in lines[1:])
