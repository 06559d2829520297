SELECT COUNT(*) FROM question as q, answer as a
WHERE q.accepted_answer_id = a.id AND a.site_id = q.site_id
  AND a.score >= 10 AND q.view_count >= 1000;
