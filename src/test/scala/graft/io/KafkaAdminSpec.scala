package graft.io

import java.util.Properties
import org.scalatest.funsuite.AnyFunSuite

class KafkaAdminSpec extends AnyFunSuite {

  private def props(kv: (String, String)*): Properties = {
    val p = new Properties()
    kv.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  test("topicSpecs: reference defaults (1 partition, RF 1)") {
    val specs = KafkaAdmin.topicSpecs(props(
      "bootstrap.servers" -> "localhost:9092",
      "output.topic.name" -> "splunknew-distict-streamsapp"))
    assert(specs == Seq(KafkaAdmin.TopicSpec("splunknew-distict-streamsapp", 1, 1)))
  }

  test("topicSpecs: explicit partition/replication overrides") {
    val specs = KafkaAdmin.topicSpecs(props(
      "output.topic.name" -> "out",
      "output.topic.partitions" -> "12",
      "output.topic.replication" -> "3"))
    assert(specs == Seq(KafkaAdmin.TopicSpec("out", 12, 3)))
  }

  test("topicSpecs: no configured topic → nothing to create") {
    assert(KafkaAdmin.topicSpecs(props("bootstrap.servers" -> "b:9092")).isEmpty)
  }

  test("createTopics is a safe no-op without Kafka client jars") {
    // this build has no kafka-clients on the classpath — must not throw
    assert(KafkaAdmin.createTopics(props(
      "bootstrap.servers" -> "localhost:9092",
      "output.topic.name" -> "out")).isEmpty)
  }
}
