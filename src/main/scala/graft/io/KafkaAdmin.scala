package graft.io

import java.util.Properties

/** S6 topic-DDL parity (reference `KStreamDistinct.java:155-170`): the
  * reference creates its output topic (1 partition, RF 1) via Kafka
  * `AdminClient` before starting; input-topic creation is present but
  * commented out there (`:159-162`).
  *
  * The Kafka client classes are loaded REFLECTIVELY: the Spark Kafka
  * connector jars are runtime-provided (none in this build's classpath),
  * and the engine must not take a compile-time Kafka dependency for an
  * optional pre-start convenience. Without the classes on the classpath
  * this is a silent no-op — the broker's `auto.create.topics.enable`
  * covers that deployment mode. Config parsing (the testable part) is
  * separated into [[KafkaAdmin.topicSpecs]].
  */
object KafkaAdmin {

  /** Mirror of the reference's `NewTopic(name, partitions, replication)`
    * arguments.
    */
  final case class TopicSpec(name: String, partitions: Int, replicationFactor: Short)

  /** Topics to create, parsed from the app properties file (S5). The
    * reference hardcodes 1 partition / RF 1 (`KStreamDistinct.java:164`);
    * here both are properties with those defaults.
    */
  def topicSpecs(props: Properties): Seq[TopicSpec] =
    Option(props.getProperty("output.topic.name")).map { name =>
      TopicSpec(name,
        props.getProperty("output.topic.partitions", "1").toInt,
        props.getProperty("output.topic.replication", "1").toShort)
    }.toSeq

  /** Create the configured topics before starting the stream (best
    * effort, like the reference — it ignores creation results too).
    * Returns the specs it attempted, Nil when no Kafka client is on the
    * classpath or no topic is configured.
    */
  def createTopics(props: Properties): Seq[TopicSpec] = {
    val specs = topicSpecs(props)
    if (specs.isEmpty) return Nil
    // no broker address → nothing to administer (Properties.put would NPE)
    val bootstrap = props.getProperty("bootstrap.servers")
    if (bootstrap == null) return Nil
    try {
      val adminCls = Class.forName("org.apache.kafka.clients.admin.AdminClient")
      val topicCls = Class.forName("org.apache.kafka.clients.admin.NewTopic")
      val adminProps = new Properties()
      adminProps.put("bootstrap.servers", bootstrap)
      val admin = adminCls.getMethod("create", classOf[Properties])
        .invoke(null, adminProps)
      try {
        val topics = new java.util.ArrayList[AnyRef]()
        specs.foreach { s =>
          topics.add(topicCls
            .getConstructor(classOf[String], classOf[Int], classOf[Short])
            .newInstance(s.name, Int.box(s.partitions), Short.box(s.replicationFactor))
            .asInstanceOf[AnyRef])
        }
        adminCls.getMethod("createTopics", classOf[java.util.Collection[_]])
          .invoke(admin, topics)
        specs
      } finally adminCls.getMethod("close").invoke(admin)
    } catch {
      // Best-effort like the reference (it ignores creation results): a
      // missing client jar means broker auto-create applies, and any
      // reflective/client failure (misconfig, unreachable broker) must
      // not take the app down at startup — log and continue.
      case _: ClassNotFoundException => Nil
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[kafka-admin] topic creation skipped: $e")
        Nil
    }
  }
}
