package graft.pipeline

/** L10 — runtime operator plugins (reference loads a Reward class from
  * a .py path via importlib, apps/training/grpo.py:212-223). The JVM
  * equivalent: instantiate an LlmClient / Sandbox / reward scorer by
  * fully-qualified class name, so deployments can register custom
  * clients without modifying the engine. Classes must have a no-arg
  * constructor and be on the executor classpath.
  */
object Plugins {

  def loadClient(className: String): LlmClient =
    load[LlmClient](className)

  def loadSandbox(className: String): Sandbox =
    load[Sandbox](className)

  def load[T](className: String): T =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[T]
}
