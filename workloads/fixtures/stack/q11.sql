SELECT COUNT(*) FROM site as s, question as q, answer as a, tag_question as tq, tag as t
WHERE q.site_id = s.site_id AND a.site_id = s.site_id AND a.question_id = q.id
  AND tq.question_id = q.id AND tq.site_id = s.site_id AND t.id = tq.tag_id
  AND s.site_name = 'stackoverflow' AND t.name IN ('sql','performance')
  AND a.score >= 3 AND q.view_count >= 2000;
