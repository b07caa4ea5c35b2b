#!/usr/bin/env bash
# One-command live-broker smoke: boots a KRaft Kafka in docker, runs
# graft.KafkaSmoke (empty-count / produce-1000 / count-1000 / offset-window
# pushdown / Avro round-trip / discovery SQL — the reference's
# TestMinimalFunctionality shape), and tears the broker down.
#
# Requires: docker (compose v2), sbt, and either spark-submit on PATH or
# SPARK_HOME set, with network access for --packages to resolve the Kafka
# connector. Cannot run in the offline build sandbox — this is the
# deployment gate for the one line (format("kafka")) the sandbox can't
# execute; run it anywhere a docker daemon exists before first cluster use.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
TOPIC="smoke_events"
SCALA_BIN="2.13"
SPARK_PKG_VERSION="${SPARK_PKG_VERSION:-4.1.2}" # match the cluster's Spark
SPARK_SUBMIT="${SPARK_HOME:+$SPARK_HOME/bin/}spark-submit"

cleanup() { docker compose -f "$HERE/docker-compose.yml" down -v >/dev/null 2>&1 || true; }
trap cleanup EXIT

echo "[smoke] starting broker"
docker compose -f "$HERE/docker-compose.yml" up -d --wait

echo "[smoke] creating topic $TOPIC (1 partition — offset-window arithmetic is exact)"
docker compose -f "$HERE/docker-compose.yml" exec broker \
  /opt/kafka/bin/kafka-topics.sh --bootstrap-server localhost:19092 \
  --create --if-not-exists --topic "$TOPIC" --partitions 1 --replication-factor 1

echo "[smoke] packaging"
(cd "$REPO" && sbt -batch package >/dev/null)
JAR="$(ls "$REPO"/target/scala-$SCALA_BIN/*.jar | head -1)"

echo "[smoke] running graft.KafkaSmoke against localhost:9092"
"$SPARK_SUBMIT" \
  --packages "org.apache.spark:spark-sql-kafka-0-10_$SCALA_BIN:$SPARK_PKG_VERSION" \
  --class graft.KafkaSmoke \
  "$JAR" localhost:9092

echo "[smoke] OK"
