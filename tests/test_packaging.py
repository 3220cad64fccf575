"""spark-submit --py-files packaging smoke (north-rule constraint): the
package zip built by tools/make_pkg.sh must be importable standalone."""

import subprocess
import sys


def test_pyfiles_zip_importable(tmp_path):
    zip_path = str(tmp_path / "pkg.zip")
    subprocess.run(["sh", "tools/make_pkg.sh", zip_path], check=True,
                   capture_output=True, cwd="/root/repo")
    # import the package from the zip alone (zipimport, as --py-files does)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import logstash_filter_elastic_integration_spark as m; "
        "from logstash_filter_elastic_integration_spark.plans.pipeline import IngestPipeline; "
        "p = IngestPipeline.from_json('x', '{\"processors\": [{\"set\": "
        "{\"field\": \"a\", \"value\": 1}}]}'); "
        "assert p.processors[0].type == 'set'; print('PKG_OK')" % zip_path)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=str(tmp_path))
    assert "PKG_OK" in out.stdout, out.stderr
