#!/bin/bash
# Offline build of the quiverjvm writer jar against the bundled Spark jars.
# No network, no sbt: plain javac. Output: quiver_spark/jvm/quiver-jvm-writer.jar
set -e
cd "$(dirname "$0")"
JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
rm -rf classes && mkdir -p classes
javac -encoding UTF-8 -cp "$JARS/*" -d classes $(find src -name '*.java')
jar cf quiver-jvm-writer.jar -C classes . -C resources .
echo "built $(pwd)/quiver-jvm-writer.jar"
