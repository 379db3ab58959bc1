#!/bin/bash
# Offline build of the quiverjvm writer jar against the bundled Spark jars.
# No network, no sbt: plain javac. Output: quiver_spark/jvm/quiver-jvm-writer.jar
set -e
cd "$(dirname "$0")"
JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
rm -rf classes && mkdir -p classes
javac -encoding UTF-8 -cp "$JARS/*" -d classes $(find src -name '*.java')
# Staleness pin: embed a fingerprint of the .java sources into the jar so
# tests can detect a source-ahead-of-binary commit (VERDICT r10 item 1).
python - <<'EOF'
import hashlib, pathlib
h = hashlib.sha256()
for p in sorted(pathlib.Path("src").rglob("*.java")):
    h.update(p.as_posix().encode())
    h.update(b"\0")
    h.update(p.read_bytes())
out = pathlib.Path("classes/io/quiverspark/source-fingerprint.txt")
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(h.hexdigest() + "\n")
print("source fingerprint:", h.hexdigest())
EOF
jar cf quiver-jvm-writer.jar -C classes . -C resources .
echo "built $(pwd)/quiver-jvm-writer.jar"
