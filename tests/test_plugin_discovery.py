"""Plugin discovery + CLI-arg instantiation + pandas_udf escape hatch
(reference: scripts/enrichment_utils.py:20-225 and the EnrichmentPlugin
arbitrary-Python surface)."""

import json
import math
import os

from boann_ocsf_security_data_platform_spark.plans.convert import convert_sarif_to_ocsf
from boann_ocsf_security_data_platform_spark.plans.enrich import (
    apply_enrichments,
    discover_enrichments,
    instantiate_enrichments,
    parse_enrichment_args,
)
from boann_ocsf_security_data_platform_spark.sources import read_sarif

PLUGIN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "plugins")


def test_discovery_finds_plugin():
    classes = discover_enrichments([PLUGIN_DIR])
    assert [c.__name__ for c in classes] == ["DescEntropyEnrichment"]


def test_broken_and_underscore_modules_skipped(tmp_path):
    d = tmp_path / "plugins"
    d.mkdir()
    (d / "_private.py").write_text("raise RuntimeError('never imported')")
    (d / "broken.py").write_text("this is not python !!!")
    (d / "good.py").write_text(
        "from boann_ocsf_security_data_platform_spark.plans.enrich import ColumnEnrichment\n"
        "class Ok(ColumnEnrichment):\n"
        "    def apply(self, df):\n        return df\n"
    )
    classes = discover_enrichments([str(d)])
    assert [c.__name__ for c in classes] == ["Ok"]


def test_arg_parsing_and_instantiation():
    args = parse_enrichment_args(["DescEntropyEnrichment:threshold=2.0", "Other:x=1,y=2"])
    assert args == {
        "DescEntropyEnrichment": {"threshold": "2.0"},
        "Other": {"x": "1", "y": "2"},
    }
    classes = discover_enrichments([PLUGIN_DIR])
    plugins = instantiate_enrichments(classes, args)
    assert len(plugins) == 1 and plugins[0].threshold == 2.0


def test_pandas_udf_plugin_end_to_end(spark, tmp_path):
    p = tmp_path / "in.sarif"
    p.write_text(
        json.dumps(
            {
                "version": "2.1.0",
                "runs": [
                    {
                        "tool": {"driver": {"name": "T"}},
                        "results": [{"ruleId": "R", "message": {"text": "aabb"}}],
                    }
                ],
            }
        )
    )
    plugins = instantiate_enrichments(
        discover_enrichments([PLUGIN_DIR]),
        parse_enrichment_args(["DescEntropyEnrichment:threshold=0.5"]),
    )
    df = apply_enrichments(
        convert_sarif_to_ocsf(read_sarif(spark, str(p)), now_ms=1), plugins
    )
    row = df.collect()[0]
    ent = [e for e in row.enrichments if e.name == "desc_entropy"][0]
    # "aabb" → two symbols, p=0.5 each → exactly 1 bit
    assert float(ent.data["entropy"]) == 1.0
    assert ent.value == "high"  # 1.0 >= 0.5 threshold
